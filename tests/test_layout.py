"""Write-side layout proofs (sources/layout.py): the engine's index
substitute must actually deliver pruning.

1. Partition pruning: a day filter resolves to PartitionFilters in the
   scan (untouched days contribute zero files).
2. Row-group selectivity: within each written file, parquet min/max
   stats on the sort key are tight and non-overlapping across row
   groups (checked via pyarrow footer metadata) — the property that
   lets a ts predicate skip row groups.
3. Round trip: data survives the layout unchanged.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


class TestTimeLayout:
    def _write(self, spark, tmp_path):
        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import write_time_layout

        ev = load_tables(spark, SF_SMALL)["events"]
        out = str(tmp_path / "events_laid_out")
        write_time_layout(ev, out, "ts")
        return ev, out

    def test_partition_pruning_in_plan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from classic_fcd_spark.sources.layout import DAY_COL, read_time_layout

        ev, out = self._write(spark, tmp_path)
        days = sorted(
            os.path.basename(p).split("=", 1)[1]
            for p in glob.glob(os.path.join(out, f"{DAY_COL}=*"))
        )
        assert len(days) >= 2, days  # sf0.001 events span multiple days
        df = read_time_layout(spark, out).filter(F.col(DAY_COL) == days[0])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert days[0] in plan  # the literal reached the scan

    def test_row_group_stats_tight_and_sorted(self, spark, tmp_path):
        _, out = self._write(spark, tmp_path)
        files = glob.glob(os.path.join(out, "*", "*.parquet"))
        assert files
        for f in files:
            md = pq.ParquetFile(f).metadata
            ts_idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "ts"
            )
            prev_max = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                assert st is not None and st.has_min_max
                assert st.min <= st.max
                if prev_max is not None:
                    # sorted writes -> row-group ranges don't overlap:
                    # a ts predicate prunes to at most one run of groups
                    assert st.min >= prev_max, (f, rg, st.min, prev_max)
                prev_max = st.max

    def test_round_trip_preserves_rows(self, spark, tmp_path):
        from classic_fcd_spark.sources.layout import DAY_COL, read_time_layout

        ev, out = self._write(spark, tmp_path)
        back = read_time_layout(spark, out).drop(DAY_COL)
        assert back.count() == ev.count()
        a = {r["event_id"] for r in ev.select("event_id").collect()}
        b = {r["event_id"] for r in back.select("event_id").collect()}
        assert a == b


class TestHotDaySplitting:
    def test_files_per_day_splits_into_contiguous_slices(self, spark, tmp_path):
        """files_per_day > 1 must actually parallelize a hot day (the r4
        version hash-partitioned on the day alone, so every day still
        landed wholly in one writer task) — and a day's files must cover
        NON-OVERLAPPING time ranges so row-group min/max stats stay
        tight (range partitioning gives this by construction; a hash
        salt would interleave the ranges)."""
        from pyspark.sql import functions as F

        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import write_time_layout

        ev = load_tables(spark, SF_SMALL)["events"]
        out = str(tmp_path / "events_salted")
        write_time_layout(ev, out, "ts", files_per_day=4)
        day_dirs = sorted(glob.glob(os.path.join(out, "day_pt=*")))
        assert day_dirs
        multi = 0
        for d in day_dirs:
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            # range partitions split proportional to sampled volume; a
            # partition may straddle a day boundary, so allow some slack
            assert 1 <= len(files) <= 10, d
            if len(files) > 1:
                multi += 1
                # non-overlapping ts ranges across the day's files
                ranges = []
                for f in files:
                    md = pq.read_metadata(f)
                    col = pq.read_schema(f).names.index("ts")
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(col).statistics
                        mins.append(st.min)
                        maxs.append(st.max)
                    ranges.append((min(mins), max(maxs)))
                ranges.sort()
                for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
                    assert hi1 <= lo2, (d, ranges)
        # the synthetic stream is dense: most days must genuinely split
        assert multi >= len(day_dirs) // 2, (multi, len(day_dirs))
        # round trip unchanged
        back = spark.read.parquet(out)
        assert back.count() == ev.count()


class TestCompaction:
    def test_compacts_only_fragmented_days_preserves_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import (
            DAY_COL,
            compact_time_layout,
            read_time_layout,
            write_time_layout,
        )

        ev = load_tables(spark, SF_SMALL)["events"]
        out = str(tmp_path / "events_frag")
        write_time_layout(ev, out, "ts", files_per_day=4)
        frag_before = {
            os.path.basename(d).split("=", 1)[1]: len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(out, f"{DAY_COL}=*"))
        }
        assert any(n > 1 for n in frag_before.values())  # precondition
        n_rows = ev.count()

        compacted = compact_time_layout(spark, out, "ts", max_files_per_day=1)
        assert set(compacted) == {d for d, n in frag_before.items() if n > 1}

        frag_after = {
            os.path.basename(d).split("=", 1)[1]: len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(out, f"{DAY_COL}=*"))
        }
        assert set(frag_after) == set(frag_before)  # no partition lost
        assert all(n == 1 for n in frag_after.values())
        back = read_time_layout(spark, out)
        assert back.count() == n_rows
        # idempotent: second pass is a no-op
        assert compact_time_layout(spark, out, "ts", max_files_per_day=1) == []

        # compacted files are still internally sorted (row-group stats
        # non-overlapping within each rewritten file)
        for d in glob.glob(os.path.join(out, f"{DAY_COL}=*")):
            for f in glob.glob(os.path.join(d, "*.parquet")):
                md = pq.read_metadata(f)
                col = pq.read_schema(f).names.index("ts")
                prev_max = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(col).statistics
                    if prev_max is not None:
                        assert st.min >= prev_max
                    prev_max = st.max


class TestTrainingShards:
    BUDGET, BPS = 64, 4  # shard ~= 256 tokens

    def _write(self, spark, tmp_path):
        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import write_training_shards

        docs = load_tables(spark, SF_SMALL)["documents"]
        out = str(tmp_path / "shards")
        write_training_shards(
            docs, out, budget=self.BUDGET, bins_per_shard=self.BPS
        )
        return docs, out

    def test_one_file_per_shard_and_round_trip(self, spark, tmp_path):
        import glob
        import os

        from classic_fcd_spark.sources.layout import read_training_shards

        docs, out = self._write(spark, tmp_path)
        shard_dirs = glob.glob(os.path.join(out, "source_pt=*", "shard_pt=*"))
        assert shard_dirs
        for d in shard_dirs:
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
        back = read_training_shards(spark, out)
        assert back.count() == docs.count()
        assert {r[0] for r in back.select("doc_id").collect()} == {
            r[0] for r in docs.select("doc_id").collect()
        }

    def test_in_file_doc_order_is_concat_order(self, spark, tmp_path):
        import glob
        import os

        import pyarrow.parquet as pq

        _, out = self._write(spark, tmp_path)
        for f in glob.glob(os.path.join(out, "source_pt=*", "shard_pt=*", "*.parquet")):
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert ids == sorted(ids), f  # the loader's contiguous stream

    def test_shuffled_shards_are_deterministic_and_permuted(self, spark, tmp_path):
        """shuffle_seed packs docs in md5(seed||id) order: the same seed
        reproduces the exact same shard assignment; a different seed is
        a different permutation; in-file order follows the shuffle key
        (the loader's stream is still contiguous); and the doc SET is
        untouched."""
        import glob
        import hashlib
        import os

        import pyarrow.parquet as pq

        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import (
            read_training_shards,
            write_training_shards,
        )

        docs = load_tables(spark, SF_SMALL)["documents"]

        def write(seed, name):
            out = str(tmp_path / name)
            write_training_shards(
                docs, out, budget=self.BUDGET, bins_per_shard=self.BPS,
                shuffle_seed=seed,
            )
            return out

        a1 = write("s1", "a1")
        a2 = write("s1", "a2")
        b = write("s2", "b")
        asg = lambda out: {  # noqa: E731
            r["doc_id"]: (r["source_pt"], r["shard_pt"])
            for r in read_training_shards(spark, out).collect()
        }
        m1, m2, mb = asg(a1), asg(a2), asg(b)
        assert m1 == m2  # same seed -> byte-stable assignment
        assert m1 != mb  # different seed -> different permutation
        assert set(m1) == set(mb) == {
            r[0] for r in docs.select("doc_id").collect()
        }
        # in-file order = the md5 shuffle key order, not id order
        key = lambda did: hashlib.md5(f"s1:{did}".encode()).hexdigest()  # noqa: E731
        saw_non_id_order = False
        for f in glob.glob(os.path.join(a1, "source_pt=*", "shard_pt=*", "*.parquet")):
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert ids == sorted(ids, key=key), f
            if ids != sorted(ids):
                saw_non_id_order = True
        assert saw_non_id_order  # the shuffle actually reordered something

    def test_shard_assignment_matches_python_prefix_sum(self, spark, tmp_path):
        """Exact reference: shard(doc) = (prefix_tokens_before // budget)
        // bins_per_shard over doc_id order per source — recomputed
        independently in Python and compared doc-for-doc (a doc longer
        than the budget legitimately skips bins, so per-shard token sums
        are NOT uniform; the assignment itself is the contract)."""
        docs, out = self._write(spark, tmp_path)
        from classic_fcd_spark.operators.dedup import ws_tokens
        from classic_fcd_spark.sources.layout import read_training_shards
        from pyspark.sql import functions as F

        toks = sorted(
            docs.select(
                "doc_id", "source", F.size(ws_tokens("text")).alias("n")
            ).collect(),
            key=lambda r: (r["source"], r["doc_id"]),
        )
        want = {}
        before = {}
        for r in toks:
            b = before.get(r["source"], 0)
            want[r["doc_id"]] = (r["source"], (b // self.BUDGET) // self.BPS)
            before[r["source"]] = b + r["n"]
        got = {
            r["doc_id"]: (r["source_pt"], int(r["shard_pt"]))
            for r in read_training_shards(spark, out).collect()
        }
        assert got == want


class TestTargetFileBytes:
    """r16 (guide §6.3): `target_file_bytes` derives bins_per_shard from
    a byte goal so one-file-per-shard outputs land near the target
    regardless of the corpus's doc-length profile."""

    def test_file_sizes_track_target(self, spark, tmp_path):
        import glob
        import os

        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import (
            read_training_shards,
            write_training_shards,
        )

        docs = load_tables(spark, SF_SMALL)["documents"]
        target = 64 * 1024  # 64 KB — small enough to force several files
        out = str(tmp_path / "shards")
        write_training_shards(docs, out, budget=128, target_file_bytes=target)
        files = glob.glob(
            os.path.join(out, "source_pt=*", "shard_pt=*", "*.parquet")
        )
        assert files
        sizes = [os.path.getsize(f) for f in files]
        total_text = docs.selectExpr("sum(length(text))").collect()[0][0]
        # count tracks total_bytes / target (parquet compression and the
        # per-source shard remainders loosen the band, so assert the
        # order of magnitude, not the exact count)
        expect = max(1, total_text // target)
        n_sources = docs.select("source").distinct().count()
        assert expect / 4 <= len(files) <= expect * 4 + n_sources
        # no file wildly over target (compression only shrinks)
        assert max(sizes) <= target * 4
        # round trip intact
        back = read_training_shards(spark, out)
        assert back.count() == docs.count()

    def test_default_path_unchanged(self, spark, tmp_path):
        """No target -> the fixed bins_per_shard path, byte-identical
        shard assignment to the pre-r16 writer."""
        import glob
        import os

        from classic_fcd_spark.session import load_tables
        from classic_fcd_spark.sources.layout import write_training_shards

        docs = load_tables(spark, SF_SMALL)["documents"]
        out = str(tmp_path / "s2")
        write_training_shards(docs, out, budget=128, bins_per_shard=8)
        assert glob.glob(os.path.join(out, "source_pt=*", "shard_pt=*"))
