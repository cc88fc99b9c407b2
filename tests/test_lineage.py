"""Kill/resume: a crashed run's completed tiles are not recomputed, and the
resumed output is identical to a single-shot run (SURVEY.md §5 item 4)."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.expressions import derived_lat, derived_lon
from osm2garmin_spark.pipeline.lineage import (
    LineageStore, read_committed_assigned, run_tiling_resumable)


@pytest.fixture()
def points(spark):
    return spark.range(0, 3000).select(
        F.col("id").alias("event_id"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"))


def _read_assigned(spark, d):
    return read_committed_assigned(spark, d).select("event_id", "tile_id")


def test_resume_skips_completed(spark, points, tmp_path):
    d_crash = str(tmp_path / "crash")
    d_clean = str(tmp_path / "clean")

    # single-shot reference run
    r = run_tiling_resumable(points, d_clean, max_nodes=300, run_id="r0")
    assert r["processed"] == r["tiles"] > 3

    # crashed run: commits only 2 tiles then "dies"
    r1 = run_tiling_resumable(points, d_crash, max_nodes=300,
                              run_id="r1", fail_after_tiles=2)
    assert r1["processed"] == 2

    store = LineageStore(d_crash)
    done_before = store.completed(spark, "assign")
    assert len(done_before) == 2

    # resume: must process exactly the remaining tiles
    r2 = run_tiling_resumable(points, d_crash, max_nodes=300, run_id="r2")
    assert r2["processed"] == r2["tiles"] - 2
    assert r2["skipped"] == 2

    # completed tiles were not recomputed: their lineage rows still carry run r1
    lin = store.read(spark).filter("stage = 'assign'")
    runs = {r_["tile_id"]: r_["run_id"] for r_ in lin.collect()}
    for t in done_before:
        assert runs[t] == "r1"

    # outputs identical to the single-shot run
    a = sorted(map(tuple, _read_assigned(spark, d_crash).collect()))
    b = sorted(map(tuple, _read_assigned(spark, d_clean).collect()))
    assert a == b

    # digests per tile match between the two runs
    dig_crash = {(r_["tile_id"]): (r_["n_rows"], r_["digest"])
                 for r_ in LineageStore(d_crash).read(spark).collect()}
    dig_clean = {(r_["tile_id"]): (r_["n_rows"], r_["digest"])
                 for r_ in LineageStore(d_clean).read(spark).collect()}
    assert dig_crash == dig_clean


def test_rerun_is_noop(spark, points, tmp_path):
    d = str(tmp_path / "noop")
    run_tiling_resumable(points, d, max_nodes=300, run_id="a")
    r = run_tiling_resumable(points, d, max_nodes=300, run_id="b")
    assert r["processed"] == 0


def test_double_commit_reader_keeps_one_attempt(spark, points, tmp_path):
    """Concurrent-writer race: if two writers commit the SAME tile under
    different attempts, the reader keeps exactly one attempt per tile
    (earliest ts) — double commit degrades to dead files, not dup rows."""
    import time
    from osm2garmin_spark.pipeline.lineage import tile_digests
    from osm2garmin_spark.operators.tile_join import assign_points_to_tiles
    from pyspark.sql import functions as F

    d = str(tmp_path / "race")
    run_tiling_resumable(points, d, max_nodes=300, run_id="w1")
    base = _read_assigned(spark, d).count()

    # simulate the second racing writer: re-write + re-commit every tile
    # under a new attempt (exactly what a racer that missed completed()
    # would do)
    store = LineageStore(d)
    tiles = store.load_tiles()
    assigned = assign_points_to_tiles(points, tiles, 2000, "lat", "lon")
    (assigned.withColumn("attempt", F.lit("w2-racer"))
     .write.mode("append").partitionBy("attempt", "tile_id")
     .parquet(os.path.join(d, "assigned")))
    store.commit(spark, "assign", "w2", tile_digests(assigned, "event_id"),
                 attempt="w2-racer")

    assert _read_assigned(spark, d).count() == base  # no duplicates


def test_time_travel_read(spark, points, tmp_path):
    """as_of reads the table as of a past commit instant."""
    import time
    d = str(tmp_path / "tt")
    r1 = run_tiling_resumable(points, d, max_nodes=300, run_id="t1",
                              fail_after_tiles=2)
    assert r1["processed"] == 2
    cut = time.time()
    n_at_cut = read_committed_assigned(spark, d).count()
    assert n_at_cut > 0
    time.sleep(0.05)
    run_tiling_resumable(points, d, max_nodes=300, run_id="t2")
    full = read_committed_assigned(spark, d).count()
    assert full > n_at_cut
    assert read_committed_assigned(spark, d, as_of=cut).count() == n_at_cut


def test_snapshot_listing(spark, points, tmp_path):
    from osm2garmin_spark.pipeline.lineage import snapshots
    d = str(tmp_path / "snap")
    run_tiling_resumable(points, d, max_nodes=300, run_id="s1",
                         fail_after_tiles=2)
    run_tiling_resumable(points, d, max_nodes=300, run_id="s2")
    snaps = snapshots(spark, d).collect()
    assert [s["run_id"] for s in snaps] == ["s1", "s2"]
    assert snaps[0]["n_tiles"] == 2
    assert snaps[0]["committed_ts"] <= snaps[1]["committed_ts"]
    assert sum(s["n_rows"] for s in snaps) == \
        read_committed_assigned(spark, d).count()


def test_crash_between_write_and_commit_no_duplicates(spark, points, tmp_path):
    """A run that dies after the data write but before the lineage commit
    must leave no visible rows: the resume re-processes everything and the
    reader never double-counts the orphaned attempt's files."""
    d = str(tmp_path / "orphan")
    d_clean = str(tmp_path / "orphan_clean")

    run_tiling_resumable(points, d_clean, max_nodes=300, run_id="c0")

    r1 = run_tiling_resumable(points, d, max_nodes=300, run_id="c1",
                              fail_before_commit=True)
    assert r1.get("crashed")
    # nothing committed → reader sees zero rows despite files on disk
    assert len(LineageStore(d).completed(spark, "assign")) == 0
    assert _read_assigned(spark, d).count() == 0

    r2 = run_tiling_resumable(points, d, max_nodes=300, run_id="c2")
    assert r2["processed"] == r2["tiles"]

    a = sorted(map(tuple, _read_assigned(spark, d).collect()))
    b = sorted(map(tuple, _read_assigned(spark, d_clean).collect()))
    assert a == b  # no duplicated rows from the orphaned attempt


def test_simultaneous_writers_reader_never_double_counts(spark, points,
                                                         tmp_path):
    """VERDICT r2 #7: two SIMULTANEOUS run_tiling_resumable invocations on
    the same output directory (both racing past completed()) — both must
    succeed, exactly one committed attempt must win per tile, and
    read_committed_assigned must equal a single-shot run exactly."""
    import threading

    d = str(tmp_path / "conc")
    d_ref = str(tmp_path / "conc_ref")
    run_tiling_resumable(points, d_ref, max_nodes=300, run_id="ref")
    expected = sorted(map(tuple, _read_assigned(spark, d_ref).collect()))

    results, errors = {}, {}

    def writer(name):
        try:
            results[name] = run_tiling_resumable(
                points, d, max_nodes=300, run_id=name)
        except Exception as e:  # noqa: BLE001
            errors[name] = e

    threads = [threading.Thread(target=writer, args=(n,))
               for n in ("wA", "wB")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # the reader resolves the race: identical to the single-shot output,
    # every tile counted exactly once no matter how many attempts committed
    got = sorted(map(tuple, _read_assigned(spark, d).collect()))
    assert got == expected

    # exactly one winning attempt per tile in the reader's selection
    from osm2garmin_spark.pipeline.lineage import read_committed_assigned
    per_tile = (read_committed_assigned(spark, d)
                .groupBy("tile_id").count().collect())
    ref_counts = {r["tile_id"]: r["count"] for r in (
        _read_assigned(spark, d_ref).groupBy("tile_id").count().collect())}
    assert {r["tile_id"]: r["count"] for r in per_tile} == ref_counts

    # write-time conflict DETECTION (not just read-time resolution): the
    # sequence-claimed manifests guarantee each tile is vouched for by
    # exactly ONE committed lineage row, and the two writers' processed
    # counts account for every tile exactly once
    store = LineageStore(d)
    lin = store.read(spark).filter("stage = 'assign'")
    per_tile_rows = lin.groupBy("tile_id").count().collect()
    assert per_tile_rows and all(r["count"] == 1 for r in per_tile_rows)
    n_tiles = len(per_tile_rows)
    assert sum(r.get("processed", 0) for r in results.values()) == n_tiles


def test_interleaved_partial_writers(spark, points, tmp_path):
    """Writer A commits a prefix of tiles and dies; two simultaneous
    resumers race to finish. The union must still be exact."""
    import threading

    d = str(tmp_path / "inter")
    d_ref = str(tmp_path / "inter_ref")
    run_tiling_resumable(points, d_ref, max_nodes=300, run_id="ref")
    expected = sorted(map(tuple, _read_assigned(spark, d_ref).collect()))

    r0 = run_tiling_resumable(points, d, max_nodes=300, run_id="w0",
                              fail_after_tiles=2)
    assert r0["processed"] == 2

    threads = [threading.Thread(
        target=run_tiling_resumable, args=(points, d),
        kwargs=dict(max_nodes=300, run_id=n)) for n in ("w1", "w2")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    got = sorted(map(tuple, _read_assigned(spark, d).collect()))
    assert got == expected


def test_eight_writer_chunked_commit_race(spark, tmp_path):
    """ADVICE r3 (medium): the commit loop must fix its claim seq BEFORE
    reading the conflict set — observing max_seq = s-1 first proves the
    read that follows covers every commit < s, so a successful link of
    exactly s cannot miss a racer's commit. 8 writers with seeded random
    tile subsets, chunk sizes, and start jitter hammer exactly that
    window: every tile must end up vouched for by EXACTLY ONE committed
    lineage row, and the per-writer committed sets must partition the
    tile universe (no tile lost, none double-committed)."""
    import random
    import threading

    d = str(tmp_path / "race8")
    store = LineageStore(d)
    tiles = list(range(100, 124))

    def stats_df(tile_ids):
        return spark.createDataFrame(
            [(t, 10, t * 7) for t in tile_ids],
            "tile_id int, n_rows long, digest long")

    committed, errors = {}, {}

    def writer(widx):
        rng = random.Random(1000 + widx)
        mine = rng.sample(tiles, k=16)
        got = set()
        try:
            i = 0
            while i < len(mine):
                chunk = mine[i:i + rng.randint(2, 6)]
                i += len(chunk)
                time.sleep(rng.random() * 0.01)
                got |= store.commit(
                    spark, "assign", f"w{widx}", stats_df(chunk),
                    attempt=f"w{widx}-c{i}", detect_conflicts=True)
            committed[widx] = got
        except Exception as e:  # noqa: BLE001
            errors[widx] = e

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # pairwise disjoint: write-time detection means no tile is vouched
    # for twice even though every writer raced over overlapping subsets
    all_claimed = [t for s in committed.values() for t in s]
    assert len(all_claimed) == len(set(all_claimed)), "double-committed tile"
    # nothing lost: the union of winners covers every tile any writer had
    union_input = set()
    for widx in range(8):
        union_input |= set(random.Random(1000 + widx).sample(tiles, k=16))
    assert set(all_claimed) == union_input

    # and the manifests agree: exactly one committed row per tile
    lin = store.read(spark).filter("stage = 'assign'")
    per_tile = lin.groupBy("tile_id").count().collect()
    assert {r["tile_id"] for r in per_tile} == union_input
    assert all(r["count"] == 1 for r in per_tile)


def test_eight_simultaneous_pipeline_writers(spark, points, tmp_path):
    """VERDICT r3 #8 at full-pipeline fan-in: 8 simultaneous
    run_tiling_resumable invocations on one output directory. All must
    succeed, the committed lineage must hold exactly one row per tile,
    the processed counts must partition the tile set, and
    read_committed_assigned must equal a single-shot run exactly."""
    import threading

    d = str(tmp_path / "conc8")
    d_ref = str(tmp_path / "conc8_ref")
    run_tiling_resumable(points, d_ref, max_nodes=300, run_id="ref")
    expected = sorted(map(tuple, _read_assigned(spark, d_ref).collect()))

    results, errors = {}, {}

    def writer(name):
        try:
            results[name] = run_tiling_resumable(
                points, d, max_nodes=300, run_id=name)
        except Exception as e:  # noqa: BLE001
            errors[name] = e

    threads = [threading.Thread(target=writer, args=(f"w{i}",))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got = sorted(map(tuple, _read_assigned(spark, d).collect()))
    assert got == expected

    store = LineageStore(d)
    lin = store.read(spark).filter("stage = 'assign'")
    per_tile_rows = lin.groupBy("tile_id").count().collect()
    assert per_tile_rows and all(r["count"] == 1 for r in per_tile_rows)
    assert (sum(r.get("processed", 0) for r in results.values())
            == len(per_tile_rows))


def test_commit_conflict_error_mode(spark, points, tmp_path):
    """on_conflict='error' raises CommitConflict instead of dropping."""
    from osm2garmin_spark.pipeline.lineage import (CommitConflict,
                                                   tile_digests)
    from osm2garmin_spark.operators.tile_join import assign_points_to_tiles

    d = str(tmp_path / "conflict_err")
    run_tiling_resumable(points, d, max_nodes=300, run_id="first")
    store = LineageStore(d)
    tiles = store.load_tiles()
    assigned = assign_points_to_tiles(points, tiles, 2000, "lat", "lon")
    stats = tile_digests(assigned, "event_id")
    with pytest.raises(CommitConflict, match="already committed"):
        store.commit(spark, "assign", "racer", stats, attempt="racer-a",
                     detect_conflicts=True, on_conflict="error")
    # and 'drop' mode commits nothing when everything is taken
    got = store.commit(spark, "assign", "racer", stats, attempt="racer-b",
                       detect_conflicts=True)
    assert got == set()


def test_manifest_column_stats_prune_reads(spark, tmp_path):
    """Manifest column stats (Iceberg lower/upper bounds): commits record
    per-tile min/max of the id column, and an id-range read prunes
    committed files whose stats exclude the range BEFORE the scan, then
    applies the exact residual predicate. Points are laid out so id
    blocks cluster spatially (ids 0-599 in band 0, 600-1199 in band 1,
    ...) — per-tile id ranges are then narrow and prunable."""
    from osm2garmin_spark.pipeline.lineage import committed_pairs

    pts = spark.range(0, 3000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") / 600).cast("int") * 10.0 - 20.0).alias("lat"),
        ((F.col("id") % 600) / 60.0 - 5.0).alias("lon"))
    d = str(tmp_path / "stats")
    run_tiling_resumable(pts, d, max_nodes=300, run_id="s0")

    store = LineageStore(d)
    lin = store.read(spark).filter("stage = 'assign'")
    # stats recorded and TRUE: manifest min/max equal the data's min/max
    full = read_committed_assigned(spark, d)
    true_stats = {r["tile_id"]: (r["lo"], r["hi"]) for r in
                  full.groupBy("tile_id")
                      .agg(F.min("event_id").alias("lo"),
                           F.max("event_id").alias("hi")).collect()}
    for r in lin.select("tile_id", "min_id", "max_id").collect():
        assert (r["min_id"], r["max_id"]) == true_stats[r["tile_id"]]

    # pruning: a one-band id range must drop most winners pre-scan
    n_all = committed_pairs(spark, d).count()
    n_pruned = committed_pairs(spark, d, id_between=(0, 599)).count()
    assert 0 < n_pruned < n_all, (n_pruned, n_all)

    # and the pruned read equals filter-after-full-read exactly
    got = sorted(map(tuple,
                     read_committed_assigned(spark, d, id_between=(0, 599))
                     .select("event_id", "tile_id").collect()))
    want = sorted(map(tuple,
                      full.filter(F.col("event_id") <= 599)
                      .select("event_id", "tile_id").collect()))
    assert got == want


def test_stats_free_manifests_stay_unprunable(spark, points, tmp_path):
    """Manifests written before the stats columns existed read as null
    min/max and must survive every reader path unpruned (correctness:
    null stats = 'cannot exclude anything')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2garmin_spark.pipeline.lineage import committed_pairs

    d = str(tmp_path / "oldfmt")
    run_tiling_resumable(points, d, max_nodes=300, run_id="new")
    store = LineageStore(d)
    lin = store.read(spark).filter("stage = 'assign'")
    n_tiles = lin.count()

    # hand-write a legacy-format manifest (no min_id/max_id columns) for
    # a fictitious extra tile, claiming the next sequence number
    legacy = pa.table({
        "stage": pa.array(["assign"]), "tile_id": pa.array([999], pa.int32()),
        "n_rows": pa.array([1], pa.int64()), "digest": pa.array([7], pa.int64()),
        "run_id": pa.array(["old"]), "attempt": pa.array(["old-a"]),
        "ts": pa.array([0.0], pa.float64())})
    seq = store._max_seq() + 1
    pq.write_table(legacy, os.path.join(store.lineage_dir,
                                        f"m{seq:08d}-old.parquet"))

    pairs = committed_pairs(spark, d, id_between=(10, 20))
    kept = {r["tile_id"] for r in pairs.collect()}
    assert 999 in kept          # null stats never pruned
    # and the stats-bearing winners behave exactly as before
    assert committed_pairs(spark, d).count() == n_tiles + 1


def test_compact_preserves_reader_semantics(spark, points, tmp_path):
    """compact() rolls every manifest into one summary file claimed via
    the same seq CAS; rows are preserved verbatim, so readers, snapshots
    and stats pruning are unchanged — only the file count drops."""
    from osm2garmin_spark.pipeline.lineage import snapshots

    d = str(tmp_path / "compact")
    run_tiling_resumable(points, d, max_nodes=300, run_id="k1",
                         fail_after_tiles=2)
    run_tiling_resumable(points, d, max_nodes=300, run_id="k2")
    store = LineageStore(d)

    before_rows = sorted(map(tuple, store.read(spark).collect()))
    before_snaps = [tuple(r) for r in snapshots(spark, d).collect()]
    before_read = sorted(map(tuple, _read_assigned(spark, d).collect()))
    n_files = len([f for f in os.listdir(store.lineage_dir)
                   if f.endswith(".parquet")])
    assert n_files == 2

    res = store.compact()
    assert res["compacted"] == 2
    files = [f for f in os.listdir(store.lineage_dir)
             if f.endswith(".parquet")]
    assert len(files) == 1                      # ONE summary manifest
    assert files[0] == f"m{res['seq']:08d}.parquet"

    # verbatim rows: lineage content, snapshot listing, reader output all
    # identical to pre-compaction
    assert sorted(map(tuple, store.read(spark).collect())) == before_rows
    assert [tuple(r) for r in snapshots(spark, d).collect()] == before_snaps
    assert sorted(map(tuple, _read_assigned(spark, d).collect())) \
        == before_read

    # idempotent: nothing left to roll
    assert store.compact()["compacted"] == 0

    # commits after compaction still work and still conflict-detect
    r = run_tiling_resumable(points, d, max_nodes=300, run_id="k3")
    assert r["processed"] == 0


def test_compact_handles_legacy_manifests(spark, points, tmp_path):
    """A pre-stats-columns manifest (no min_id/max_id) compacts cleanly:
    the summary carries null stats for its rows (still unprunable)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2garmin_spark.pipeline.lineage import committed_pairs

    d = str(tmp_path / "compat_legacy")
    run_tiling_resumable(points, d, max_nodes=300, run_id="n1")
    store = LineageStore(d)
    legacy = pa.table({
        "stage": pa.array(["assign"]), "tile_id": pa.array([999], pa.int32()),
        "n_rows": pa.array([1], pa.int64()), "digest": pa.array([7], pa.int64()),
        "run_id": pa.array(["old"]), "attempt": pa.array(["old-a"]),
        "ts": pa.array([0.0], pa.float64())})
    seq = store._max_seq() + 1
    pq.write_table(legacy, os.path.join(store.lineage_dir,
                                        f"m{seq:08d}-old.parquet"))
    n_before = store.read(spark).count()

    assert store.compact()["compacted"] == 2
    lin = store.read(spark)
    assert lin.count() == n_before
    row = lin.filter("tile_id = 999").collect()[0]
    assert row["min_id"] is None and row["max_id"] is None
    kept = {r["tile_id"] for r in
            committed_pairs(spark, d, id_between=(10, 20)).collect()}
    assert 999 in kept                          # null stats never pruned


def test_compact_races_with_committers(spark, tmp_path):
    """4 committer threads + 2 compactor threads hammering one store:
    every tile still ends up vouched for by exactly one committed row
    (the compactor's claim participates in the same seq CAS; committers
    rescan on FileNotFoundError from mid-compaction deletes)."""
    import random
    import threading

    d = str(tmp_path / "compact_race")
    store = LineageStore(d)
    tiles = list(range(200, 232))

    def stats_df(tile_ids):
        return spark.createDataFrame(
            [(t, 10, t * 7) for t in tile_ids],
            "tile_id int, n_rows long, digest long")

    committed, errors = {}, {}
    done_flag = threading.Event()

    def writer(widx):
        rng = random.Random(3000 + widx)
        mine = rng.sample(tiles, k=20)
        got = set()
        try:
            i = 0
            while i < len(mine):
                chunk = mine[i:i + rng.randint(2, 5)]
                i += len(chunk)
                time.sleep(rng.random() * 0.01)
                got |= store.commit(
                    spark, "assign", f"w{widx}", stats_df(chunk),
                    attempt=f"w{widx}-c{i}", detect_conflicts=True)
            committed[widx] = got
        except Exception as e:  # noqa: BLE001
            errors[widx] = e

    def compactor(cidx):
        rng = random.Random(4000 + cidx)
        try:
            while not done_flag.is_set():
                time.sleep(rng.random() * 0.02)
                store.compact()
        except Exception as e:  # noqa: BLE001
            errors[f"c{cidx}"] = e

    ws = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    cs = [threading.Thread(target=compactor, args=(c,)) for c in range(2)]
    for t in ws + cs:
        t.start()
    for t in ws:
        t.join()
    done_flag.set()
    for t in cs:
        t.join()
    assert not errors, errors

    all_claimed = [t for s in committed.values() for t in s]
    assert len(all_claimed) == len(set(all_claimed)), "double-committed tile"
    union_input = set()
    for widx in range(4):
        union_input |= set(random.Random(3000 + widx).sample(tiles, k=20))
    assert set(all_claimed) == union_input

    lin = store.read(spark).filter("stage = 'assign'")
    per_tile = lin.groupBy("tile_id").count().collect()
    assert {r["tile_id"] for r in per_tile} == union_input
    assert all(r["count"] == 1 for r in per_tile)


def test_conflict_read_is_incremental(spark, tmp_path):
    """The immutable-manifest cache makes a writer's Nth conflict read
    open only manifests it has not seen — O(new), not O(total) (VERDICT
    r4 weak #1). Physical opens are counted by manifest_read_count()."""
    from osm2garmin_spark.pipeline.lineage import manifest_read_count

    d = str(tmp_path / "incr")
    store = LineageStore(d)

    def stats_df(t):
        return spark.createDataFrame([(t, 1, t)],
                                     "tile_id int, n_rows long, digest long")

    n = 12
    opens = []
    for t in range(n):
        before = manifest_read_count()
        store.commit(spark, "assign", "w", stats_df(t), attempt=f"a{t}",
                     detect_conflicts=True)
        opens.append(manifest_read_count() - before)
    # commit k sees k prior manifests but opens at most the ONE that is
    # new since the previous conflict read (0 or 1, never k)
    assert max(opens) <= 1, opens
    assert sum(opens) <= n


def test_auto_compaction_hook(spark, points, tmp_path):
    """compact_after: a resumable run rolls accumulated manifests into
    one summary once their count exceeds the threshold; reader output
    and a subsequent resume are unaffected."""
    d = str(tmp_path / "autocompact")
    run_tiling_resumable(points, d, max_nodes=300, run_id="a1",
                         fail_after_tiles=1)
    run_tiling_resumable(points, d, max_nodes=300, run_id="a2",
                         fail_after_tiles=3)
    r = run_tiling_resumable(points, d, max_nodes=300, run_id="a3",
                             compact_after=1)
    assert r.get("compacted", 0) >= 3          # three commits rolled up
    store = LineageStore(d)
    files = [f for f in os.listdir(store.lineage_dir)
             if f.endswith(".parquet")]
    assert len(files) == 1
    # rerun is still a no-op and the reader sees every tile exactly once
    assert run_tiling_resumable(points, d, max_nodes=300,
                                run_id="a4")["processed"] == 0
    per_tile = (read_committed_assigned(spark, d).groupBy("tile_id")
                .count().count())
    assert per_tile == r["tiles"]


def test_auto_compaction_hook_catalog(spark, points, tmp_path):
    """Same hook through the catalog backend: the reference list shrinks
    to one summary blob, committed history stays visible."""
    from osm2garmin_spark.pipeline.catalog import (CatalogClient,
                                                   CatalogServer,
                                                   _table_key,
                                                   read_catalog_lineage)

    srv = CatalogServer().start()
    try:
        c = CatalogClient(srv.url)
        d = str(tmp_path / "autocompact_cat")
        run_tiling_resumable(points, d, max_nodes=300, run_id="c1",
                             fail_after_tiles=2, catalog=c)
        r = run_tiling_resumable(points, d, max_nodes=300, run_id="c2",
                                 catalog=c, compact_after=1)
        assert r.get("compacted", 0) == 2
        st = c.state(_table_key(d, None))
        assert len(st["manifests"]) == 1
        lin = read_catalog_lineage(spark, d, c)
        per_tile = lin.filter("stage = 'assign'").groupBy("tile_id") \
                      .count().collect()
        assert len(per_tile) == r["tiles"]
        assert all(x["count"] == 1 for x in per_tile)
    finally:
        srv.stop()


def test_string_id_column_commits_null_stats(spark, tmp_path):
    """A non-numeric id column (the corpus's 'img123' strings) must commit
    NULL min/max stats — unprunable but correct — not fail the ANSI cast
    mid-commit (the spark-submit packaging job hit exactly this)."""
    d = str(tmp_path / "strid")
    pts = spark.range(0, 2000).select(
        F.concat(F.lit("img"), F.col("id").cast("string")).alias("event_id"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"))
    r = run_tiling_resumable(pts, d, max_nodes=500, run_id="s")
    assert r["processed"] == r["tiles"] >= 1
    lin = LineageStore(d).read(spark).filter(F.col("stage") == "assign")
    assert lin.filter(F.col("min_id").isNotNull()
                      | F.col("max_id").isNotNull()).count() == 0
    # id_between pruning must degrade to the exact residual filter
    got = read_committed_assigned(spark, d, id_between=("img100", "img199"))
    ids = {row["event_id"] for row in got.select("event_id").collect()}
    assert ids and all("img100" <= i <= "img199" for i in ids)
