"""Similarity search over embedding columns (`array<float>`).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the candidate corpus; per-partition partial top-k via the
  rank window.  The correctness baseline.
- ``cosine_near_pairs`` — all-pairs above a cosine threshold on a bounded
  subset (embedding near-dup dedup tier).
- ``lsh_ann_topk`` — random-hyperplane LSH: deterministic ±1 hyperplanes
  (md5-parity seeded), vectors bucketed by signature, exact rerank within
  bucket.  The scale path: candidate generation is an equi-join on a
  16-bit key instead of a crossJoin.

All dot products run as Catalyst ``aggregate(zip_with(...))`` over
double-cast arrays — JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, x) -> acc + x))"


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x AS double))")


def cosine_expr(a: str, b: str) -> F.Column:
    return F.expr(f"({_DOT.format(a=a, b=b)}) / "
                  f"(({_NORM.format(a=a)}) * ({_NORM.format(a=b)}))")


def _rerank_topk(cand: DataFrame, k: int, unit: bool = False) -> DataFrame:
    """Exact cosine rerank + top-k over candidate rows
    (query_id, neighbor_id, qv, cv).  THE determinism contract shared by
    the brute-force baseline and both ANN paths: rank on the
    4-dp-rounded score with neighbor_id tie-break, so results are stable
    across engines and float-summation orders — one definition, or the
    ANN paths silently diverge from the baseline they are validated
    against.  ``unit=True`` asserts both sides are pre-normalized
    (with_unit_vector) so the score is a single dot per candidate row
    instead of three interpreted folds — same 4-dp scores."""
    score = dot_expr("qv", "cv") if unit else cosine_expr("qv", "cv")
    j = cand.withColumn("cos_sim", F.round(score, 4))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc("neighbor_id"))
    return (j.withColumn("rnk", F.row_number().over(w)).filter(f"rnk <= {k}")
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rnk").cast("int").alias("rnk")))


def brute_force_topk(queries: DataFrame, candidates: DataFrame,
                     k: int = 5) -> DataFrame:
    """queries(query_id, qv) × candidates(neighbor_id, cv) → top-k rows."""
    return _rerank_topk(
        with_unit_vector(candidates, "cv", "cv")
        .crossJoin(F.broadcast(with_unit_vector(queries, "qv", "qv"))),
        k, unit=True)


def prepare_vectors(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    return emb.select(F.col(id_col).alias("vec_id"),
                      _as_double(vec_col).alias("v"))


def dot_expr(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def with_unit_vector(df: DataFrame, vec_col: str = "v",
                     out: str = "vn") -> DataFrame:
    """Project a unit-normalized copy of ``vec_col``, computing the norm
    ONCE as its own column (the lambda references it, it is not
    re-evaluated per element).  Cosine of unit vectors is their dot —
    on a quadratic pair path this replaces cosine_expr's three
    interpreted array folds per PAIR with one fold per pair plus one
    normalization per VECTOR, the same hoist-out-of-the-hot-loop move
    as BENCH.md lesson 3b.  4-dp-rounded scores are unchanged (the
    oracle computes the algebraically identical dot/(|a||b|))."""
    return (df.withColumn("_nrm", F.expr(_NORM.format(a=vec_col)))
            .withColumn(out, F.expr(f"transform({vec_col},"
                                    f" x -> x / _nrm)"))
            .drop("_nrm"))


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """ALL-PAIRS cosine near-dup pairs — exact, O(n²): the bounded
    verification tier for small subsets only.  The production path at
    corpus scale is ``lsh_near_pairs`` below (banded equi-join)."""
    normed = with_unit_vector(prepare_vectors(emb))
    a = normed.select(F.col("vec_id").alias("id_a"),
                      F.col("vn").alias("va"))
    b = normed.select(F.col("vec_id").alias("id_b"),
                      F.col("vn").alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", F.round(dot_expr("va", "vb"), 4))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def lsh_near_pairs(emb: DataFrame, threshold: float = 0.95, dim: int = 64,
                   n_planes: int = 8, n_tables: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_bucket: int | None = None) -> DataFrame:
    """Embedding near-dup pairs ≥ ``threshold`` via LSH buckets — the
    scale path: candidates collide in ≥1 table's hyperplane-signature
    bucket (equi-join on (table, sig), fixed-size keys), then exact
    cosine verification.  No all-pairs / non-equi join anywhere in the
    plan.  Deterministic (md5-parity hyperplanes) but approximate by
    bucketing: pairs hashed apart in every table are missed — at the
    production threshold (≥0.95) collision probability per table is
    (1-θ/π)^n_planes with θ = arccos(0.95) ≈ 18°, i.e. ≈0.41, and ≥1-of-2
    tables ≈ 0.66; raise n_tables for higher recall (linear cost).

    ``max_bucket`` is the hot-bucket guard: a degenerate signature (e.g.
    a spike of near-zero vectors all hashing to one bucket) can make one
    bucket quadratic; buckets wider than the cap contribute STAR edges
    (member ↔ bucket-min) — O(width) candidates, cosine-verified like
    every other candidate, so precision is unchanged."""
    vs = prepare_vectors(emb, id_col, vec_col)
    sigs = with_unit_vector(lsh_signatures(vs, dim, n_planes, n_tables))
    a = sigs.select(F.col("vec_id").alias("id_a"), F.col("vn").alias("va"),
                    "table", "sig")
    b = sigs.select(F.col("vec_id").alias("id_b"), F.col("vn").alias("vb"),
                    "table", "sig")
    if max_bucket is None:
        cand = (a.join(b, ["table", "sig"])
                .filter(F.col("id_a") < F.col("id_b")))
    else:
        widths = sigs.groupBy("table", "sig").agg(
            F.count("*").alias("_w"), F.min("vec_id").alias("_hub"))
        a_k = a.join(widths, ["table", "sig"])
        normal = (a_k.filter(F.col("_w") <= max_bucket).drop("_w", "_hub")
                  .join(b, ["table", "sig"])
                  .filter(F.col("id_a") < F.col("id_b")))
        hubs = (a_k.filter(F.col("_w") > max_bucket)
                .filter(F.col("id_a") == F.col("_hub"))
                .select("table", "sig", F.col("id_a"), F.col("va")))
        star = (hubs.join(b, ["table", "sig"])
                .filter(F.col("id_a") < F.col("id_b")))
        cand = normal.unionByName(star)
    return (cand
            .dropDuplicates(["id_a", "id_b"])
            .withColumn("cos_sim", F.round(dot_expr("va", "vb"), 4))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity — reproducible across
    runs/machines with no RNG state; ``table`` seeds independent tables."""
    return [[1.0 if hashlib.md5(f"{table}|{j}|{d}".encode()).digest()[0] % 2
             else -1.0 for d in range(dim)] for j in range(n_planes)]


def lsh_signatures(vectors: DataFrame, dim: int, n_planes: int = 8,
                   n_tables: int = 2) -> DataFrame:
    """One signature row per (vector, table): standard multi-table LSH —
    a pair is a candidate if it collides in ANY table, which trades a
    linear factor of candidates for exponential recall gain."""
    out = []
    for t in range(n_tables):
        sig = None
        for j, plane in enumerate(hyperplanes(dim, n_planes, t)):
            lit = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
            bit = F.when(F.expr(_DOT.format(a="v", b=lit)) > 0,
                         F.lit(1 << j)).otherwise(F.lit(0))
            sig = bit if sig is None else (sig + bit)
        out.append(vectors.withColumn("table", F.lit(t))
                   .withColumn("sig", sig.cast("int")))
    df = out[0]
    for o in out[1:]:
        df = df.unionByName(o)
    return df


def ivf_centroids(candidates: DataFrame, n_centroids: int = 8,
                  refine_iters: int = 0,
                  sample_fraction: float | None = None) -> DataFrame:
    """Coarse quantizer for IVF: deterministic seeds = the ``n_centroids``
    lowest-``vec_id`` candidate vectors (reproducible across engines, no RNG,
    SQL-expressible), optionally refined with ``refine_iters`` Lloyd steps
    expressed as DataFrame ops (broadcast-argmin assign → position-wise mean
    via ``posexplode``/``avg``).  Returns (centroid_id:int, cv:array<double>).

    ``sample_fraction``: the 100 TB knob — seeding and refinement run
    over a seeded uniform SAMPLE of the corpus instead of the full table
    (the limit(k) seed is a TakeOrdered, cheap at any scale, but each
    Lloyd step over 10^12 vectors is not; a 10^-6 sample refines the
    same centroids to within sampling noise).  Sampled seeding is
    deterministic for a fixed input partitioning (Spark's seeded
    Bernoulli sample is per-partition), which is why the exactly-oracled
    query path keeps the default ``None``."""
    pool = (candidates if sample_fraction is None
            else candidates.sample(fraction=sample_fraction, seed=42))
    cents = (pool.orderBy("vec_id").limit(n_centroids)
             .withColumn("centroid_id",
                         (F.row_number().over(Window.orderBy("vec_id")) - 1)
                         .cast("int"))
             .select("centroid_id", F.col("v").alias("cv")))
    for _ in range(refine_iters):
        assigned = ivf_assign(pool, cents, n_probe=1) \
            .select("centroid_id", "v")
        ex = assigned.select("centroid_id", F.posexplode("v").alias("pos", "val"))
        cents = (ex.groupBy("centroid_id", "pos").agg(F.avg("val").alias("mv"))
                 .groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "mv")))
                      .alias("s"))
                 .select("centroid_id",
                         F.expr("transform(s, x -> x.mv)").alias("cv")))
    return cents


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               n_probe: int = 1) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by cosine
    (4-dp-rounded score, centroid_id tie-break — deterministic across
    engines).  The centroid table is broadcast, so assignment is map-side:
    no shuffle of the big side, which is what makes IVF the scale path."""
    j = (vectors.crossJoin(F.broadcast(centroids))
         .withColumn("ccos", F.round(cosine_expr("v", "cv"), 4)))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                             F.asc("centroid_id"))
    return (j.withColumn("crn", F.row_number().over(w))
            .filter(f"crn <= {n_probe}")
            .select("vec_id", "v", "centroid_id"))


def ivf_ann_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                 n_centroids: int = 8, n_probe: int = 2,
                 refine_iters: int = 0, quantized: bool = False) -> DataFrame:
    """IVF ANN: coarse-quantize candidates into ``n_centroids`` inverted
    lists (one equi-join key per vector), probe each query's ``n_probe``
    nearest lists, exact cosine rerank within probed lists.  Candidate
    generation is an equi-join on ``centroid_id`` — no crossJoin against
    the corpus at any scale; recall < 1 by construction (tested vs brute
    force on planted neighbors).  Complements ``lsh_ann_topk``: IVF adapts
    to the data distribution (with refinement), LSH is data-independent.

    ``quantized=True`` serves the rerank from the int8 STORE: list
    vectors round-trip through ``quantize_embeddings`` /
    ``dequantize_embeddings`` (the 4×-smaller storage tier) while the
    index structure (centroids, list assignment) is built from the
    float vectors and queries stay float — exactly the production split
    where the index is built once from floats and served from int8.
    Scores shift by the (tiny) quantization error; ranking contract is
    unchanged (4-dp round, id tie-break)."""
    cents = ivf_centroids(candidates, n_centroids, refine_iters)
    lists = ivf_assign(candidates, cents, n_probe=1) \
        .select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
                "centroid_id")
    if quantized:
        store = dequantize_embeddings(
            quantize_embeddings(candidates, id_col="vec_id", vec_col="v"))
        lists = (lists.drop("cv")
                 .join(store.withColumnRenamed("vec_id", "neighbor_id"),
                       "neighbor_id")
                 .withColumnRenamed("v", "cv"))
    probes = ivf_assign(
        queries.select(F.col("vec_id"), F.col("v")), cents, n_probe=n_probe) \
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                "centroid_id")
    cand = (with_unit_vector(lists, "cv", "cv")
            .join(F.broadcast(with_unit_vector(probes, "qv", "qv")),
                  "centroid_id")
            .select("query_id", "neighbor_id", "qv", "cv")
            .dropDuplicates(["query_id", "neighbor_id"]))
    return _rerank_topk(cand, k, unit=True)


_IVF_MANIFEST = "_current.json"


def _read_ivf_manifest(path: str) -> dict:
    """Resolve the IVF index layout: manifest (segmented) or the legacy
    build-once flat layout (centroids + one lists dir at ``path``)."""
    import json
    import os
    man = os.path.join(path, _IVF_MANIFEST)
    if os.path.exists(man):
        with open(man) as fh:
            return json.load(fh)
    return {"snapshot": None, "centroids": f"{path}/centroids",
            "segments": [f"{path}/lists"]}


def _write_ivf_manifest(path: str, manifest: dict) -> None:
    import json
    import os
    tmp = os.path.join(path, f".{_IVF_MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(path, _IVF_MANIFEST))  # commit point


def _read_lists_dir(spark, d: str) -> DataFrame:
    """Read one lists directory, via the sibling ``<dir>_schema`` 0-row
    unpartitioned pin when present — an EMPTY corpus leaves a
    partitioned dir with no inferable schema (same device as the BM25
    index's postings_schema).  Build and compact write the pin;
    appended segments are never empty (empty batches are no-ops)."""
    import os
    pin = f"{d}_schema"
    if os.path.isdir(pin):
        return (spark.read.schema(spark.read.parquet(pin).schema)
                .parquet(d))
    return spark.read.parquet(d)


def _ivf_lists(vecs: DataFrame, cents: DataFrame,
               quantized: bool) -> DataFrame:
    """Inverted-list rows for a vector batch under FIXED centroids —
    shared by build and append so both write the identical layout."""
    asn = ivf_assign(vecs, cents, n_probe=1)
    if quantized:
        return (asn.select("vec_id", "centroid_id")
                .join(quantize_embeddings(vecs, id_col="vec_id",
                                          vec_col="v"), "vec_id")
                .select(F.col("vec_id").alias("neighbor_id"), "scale",
                        "q", "centroid_id"))
    return asn.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("v").alias("cv"), "centroid_id")


def build_ivf_index(candidates: DataFrame, path: str, n_centroids: int = 8,
                    refine_iters: int = 0, quantized: bool = False,
                    centroids: DataFrame | None = None) -> None:
    """Materialize an IVF index: inverted lists written as parquet
    partitioned by ``centroid_id`` (Iceberg equivalent: identity-partition
    on centroid_id), centroids alongside.  The 100 TB pattern: the
    corpus-side assignment pass runs ONCE; every subsequent query batch
    reads only its probed lists via partition pruning instead of
    re-scanning (or re-quantizing) the corpus.  Rolling ingest does NOT
    force rebuilds: ``append_ivf_index`` assigns new batches to the
    FROZEN centroids as per-batch list segments, and
    ``compact_ivf_index`` merges segments under an atomic manifest flip.

    ``quantized=True`` writes the lists in int8 form — (neighbor_id,
    scale:double, q:array<tinyint>, centroid_id) — 4× smaller on disk;
    ``query_ivf_index`` dequantizes on read.  Centroids stay float (they
    are ``n_centroids`` rows — size is irrelevant, assignment accuracy
    is not).  Pass ``centroids`` to pin an externally trained quantizer
    (also what makes build-vs-append equality testable)."""
    import os
    import shutil
    if os.path.isdir(path):  # fresh build: clear stale manifest/segments
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d == _IVF_MANIFEST or d.startswith(f".{_IVF_MANIFEST}"):
                os.remove(full)
            elif ((d.startswith("seg-") or d.startswith("snap="))
                  and os.path.isdir(full)):
                shutil.rmtree(full)
    cents = (centroids if centroids is not None
             else ivf_centroids(candidates, n_centroids, refine_iters))
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    spark = candidates.sparkSession
    cents_r = spark.read.parquet(f"{path}/centroids")
    lists = _ivf_lists(candidates, cents_r, quantized)
    (lists.write.mode("overwrite").partitionBy("centroid_id")
     .parquet(f"{path}/lists"))
    (lists.limit(0).write.mode("overwrite")
     .parquet(f"{path}/lists_schema"))
    # the manifest is written LAST — its presence is the build's commit
    # marker (the streaming twin keys bootstrap-complete detection on
    # it: directories exist from job start, so they cannot signal
    # completion — the stream_dedup_ingest _SUCCESS lesson)
    _write_ivf_manifest(path, {"snapshot": None,
                               "centroids": f"{path}/centroids",
                               "segments": [f"{path}/lists"]})


def append_ivf_index(new_vecs: DataFrame, path: str,
                     batch_tag: str | None = None) -> dict:
    """Add a vector batch to an existing IVF index WITHOUT rebuilding:
    assign the batch to the index's FROZEN centroids, write it as one
    new list segment (overwrite-mode — a replayed ``batch_tag``
    replaces itself), and publish the grown segment list with one
    atomic manifest rename.  Under fixed centroids this is EXACT:
    append-then-query ≡ an index built over the union with the same
    centroids (pinned in pytest), because list membership depends only
    on (vector, centroids).  The quantized/float layout is inherited
    from the existing lists' schema.

    THE FROZEN-QUANTIZER TRADE (documented-stale, the IVF analogue of
    the dedup index's frozen keepers): centroids are never retrained,
    so if the appended distribution DRIFTS away from the build-time
    corpus, new vectors crowd into few lists and probe recall degrades.
    Mitigation is a periodic REBUILD (the ``dedup_index_reconcile``
    analogue would retrain + reassign everything — for IVF that IS a
    rebuild); ``compact_ivf_index`` repacks segments but deliberately
    keeps the quantizer frozen so compaction never changes answers."""
    import os
    import re
    spark = new_vecs.sparkSession
    man = _read_ivf_manifest(path)
    if new_vecs.isEmpty():
        # a 0-row partitioned segment has no inferable schema; an empty
        # batch is a no-op (same contract as the streaming processors'
        # empty-micro-batch skip)
        return man
    cents = spark.read.parquet(man["centroids"])
    quantized = "q" in _read_lists_dir(spark, man["segments"][0]).columns
    if batch_tag is None:
        nums = [int(m.group(1)) for d in os.listdir(path)
                if (m := re.fullmatch(r"seg-a(\d+)", d))]
        batch_tag = f"a{(max(nums) + 1 if nums else 0):06d}"
    seg = os.path.join(path, f"seg-{batch_tag}")
    (_ivf_lists(new_vecs, cents, quantized)
     .write.mode("overwrite").partitionBy("centroid_id").parquet(seg))
    segments = [s for s in man["segments"] if s != seg] + [seg]
    manifest = {"snapshot": man.get("snapshot"),
                "centroids": man["centroids"], "segments": segments}
    if "history" in man:  # the snapshot log survives appends
        manifest["history"] = man["history"]
    _write_ivf_manifest(path, manifest)
    return manifest


def compact_ivf_index(spark, path: str, snapshot_id: str | None = None,
                      vacuum: bool = True,
                      num_files: int | None = None,
                      keep_snapshots: int = 1) -> dict:
    """Merge all list segments into ONE under ``<path>/snap=<id>``
    (centroids copied alongside so the snapshot is self-contained) and
    flip the manifest atomically.  The quantizer stays FROZEN — the
    rewrite is a byte-level repack, so answers are unchanged by
    construction.  ``vacuum`` removes the unreferenced segment dirs
    right after the flip; as elsewhere, that invalidates DataFrame
    handles resolved BEFORE the compact."""
    import os
    import re
    import shutil
    man = _read_ivf_manifest(path)
    if snapshot_id is None:
        nums = [int(m.group(1)) for d in os.listdir(path)
                if (m := re.fullmatch(r"snap=c(\d+)", d))]
        snapshot_id = f"c{(max(nums) + 1 if nums else 0):06d}"
    snap = os.path.join(path, f"snap={snapshot_id}")
    if any(os.path.normpath(f"{snap}/lists") == os.path.normpath(s)
           for s in man["segments"]):
        raise ValueError(
            f"snapshot_id {snapshot_id!r} is a currently published "
            "segment — compaction must mint a fresh id, or the rewrite "
            "would overwrite its own input mid-scan")
    lists = _read_lists_dir(spark, man["segments"][0])
    for s in man["segments"][1:]:
        lists = lists.unionByName(_read_lists_dir(spark, s))
    if num_files is not None:
        lists = lists.coalesce(num_files)
    (lists.write.mode("overwrite").partitionBy("centroid_id")
     .parquet(f"{snap}/lists"))
    (lists.limit(0).write.mode("overwrite")
     .parquet(f"{snap}/lists_schema"))
    (spark.read.parquet(man["centroids"])
     .write.mode("overwrite").parquet(f"{snap}/centroids"))
    # snapshot log: freeze the superseded state (with every segment
    # appended while it was current) into history; `vacuum` retains the
    # newest `keep_snapshots` entries — same commit-vs-expiry split as
    # the dedup index's `_write_index_snapshot`
    from ..plans.publish import referenced_roots, segmented_history
    history = segmented_history(man, _IVF_ENTRY_KEYS)
    history.append({"snapshot": snapshot_id,
                    "centroids": f"{snap}/centroids",
                    "segments": [f"{snap}/lists"]})
    if vacuum:
        if keep_snapshots < 1:
            raise ValueError("keep_snapshots must be >= 1")
        history = history[-keep_snapshots:]
    manifest = {"snapshot": snapshot_id,
                "centroids": f"{snap}/centroids",
                "segments": [f"{snap}/lists"],
                "history": history}
    _write_ivf_manifest(path, manifest)
    if vacuum:
        keep = referenced_roots(path, history)
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d in keep or not os.path.isdir(full):
                continue
            if (d.startswith("seg-") or d.startswith("snap=")
                    or d in ("lists", "lists_schema", "centroids")):
                shutil.rmtree(full)
    return manifest


_IVF_ENTRY_KEYS = ("snapshot", "centroids", "segments")


def ivf_index_history(path: str) -> list[dict]:
    """Snapshot log of the IVF index, oldest → newest (current last);
    ``[]`` for a build-once index.  Entries are frozen AS-SUPERSEDED
    states, same semantics as ``dedup.index_snapshot_history``."""
    from ..plans.publish import segmented_history
    return segmented_history(_read_ivf_manifest(path), _IVF_ENTRY_KEYS)


def expire_ivf_index_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` retained IVF snapshots —
    the file-expiry half of the lifecycle; the current snapshot is
    always kept.  Returns the rewritten manifest."""
    from ..plans.publish import expire_segmented_snapshots
    return expire_segmented_snapshots(
        path, _IVF_MANIFEST, _IVF_ENTRY_KEYS, keep_last=keep_last,
        legacy_dirs=("lists", "lists_schema", "centroids"))


def query_ivf_index(spark, path: str, queries: DataFrame, k: int = 5,
                    n_probe: int = 2,
                    snapshot_id: str | None = None) -> DataFrame:
    """Query a materialized IVF index.  The probed centroid_ids reach
    every list segment's scan as a partition filter (visible as
    PartitionFilters in the plan when probes are literal); rerank is
    exact within probed lists — identical ranking contract to the other
    ANN paths (_rerank_topk).  A quantized index (int8 lists, see
    ``build_ivf_index``) is detected by schema and dequantized inside
    the rerank projection.  Segments (appended batches) union before
    the probe join — list membership is per-vector, so segmentation
    never changes the candidate set.

    ``snapshot_id`` time-travels: serve from a RETAINED snapshot (see
    ``ivf_index_history``) instead of the current one — the
    repeatable-scan pin a reader holds across a compaction until
    ``expire_ivf_index_snapshots`` drops it."""
    man = _read_ivf_manifest(path)
    if snapshot_id is not None:
        from ..plans.publish import resolve_segmented_snapshot
        man = resolve_segmented_snapshot(man, _IVF_ENTRY_KEYS,
                                         snapshot_id, "IVF index")
    cents = spark.read.parquet(man["centroids"])
    lists = _read_lists_dir(spark, man["segments"][0])
    for s in man["segments"][1:]:
        lists = lists.unionByName(_read_lists_dir(spark, s))
    if "q" in lists.columns:
        lists = lists.select(
            "neighbor_id",
            F.expr("transform(q, x -> cast(x AS double) * scale)")
            .alias("cv"), "centroid_id")
    probes = ivf_assign(queries, cents, n_probe=n_probe) \
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                "centroid_id")
    cand = (with_unit_vector(lists, "cv", "cv")
            .join(F.broadcast(with_unit_vector(probes, "qv", "qv")),
                  "centroid_id")
            .select("query_id", "neighbor_id", "qv", "cv")
            .dropDuplicates(["query_id", "neighbor_id"]))
    return _rerank_topk(cand, k, unit=True)


def lsh_ann_topk(queries: DataFrame, candidates: DataFrame, dim: int,
                 k: int = 5, n_planes: int = 8, n_tables: int = 2) -> DataFrame:
    """ANN: bucket by hyperplane signature per table, dedup candidates
    across tables, exact cosine rerank.  Recall < 1 by construction (tested
    vs brute force on planted neighbors); candidate generation is an
    equi-join on (table, signature) — no crossJoin at any scale."""
    qs = lsh_signatures(queries, dim, n_planes, n_tables)
    cs = (lsh_signatures(candidates, dim, n_planes, n_tables)
          .select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
                  F.col("table").alias("ctable"), F.col("sig").alias("csig")))
    cand = (with_unit_vector(cs, "cv", "cv").join(F.broadcast(
        with_unit_vector(
            qs.select(F.col("vec_id").alias("query_id"),
                      F.col("v").alias("qv"), "table", "sig"),
            "qv", "qv")),
        (F.col("ctable") == F.col("table")) & (F.col("csig") == F.col("sig")))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"]))
    return _rerank_topk(cand, k, unit=True)


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization for the embedding STORE:
    scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127] —
    4× smaller than float32 at <0.1% cosine error for typical
    embeddings, which at trillion-vector scale is the difference between
    one storage tier and four.  Zero vectors quantize to all-zeros with
    scale 0.  Pure Catalyst (transform/aggregate), deterministic, and
    reproducible in ANSI SQL.  Returns (vec_id, scale, q:array<tinyint>).

    The per-vector scale is projected into a column FIRST and captured by
    the quantization lambda (HOF lambdas can reference outer attributes),
    so quantization is O(d) per vector — recomputing the max-abs
    aggregate inside the per-element lambda would be O(d²), a real cost
    on the trillion-vector store this operator exists for."""
    maxabs = F.expr(f"aggregate(transform({vec_col}, x -> abs(cast(x AS double))), "
                    "0D, (a, x) -> greatest(a, x))")
    base = emb.select(F.col(id_col).alias("vec_id"),
                      _as_double(vec_col).alias("_v"),
                      (maxabs / F.lit(127.0)).alias("scale"))
    q = F.when(F.col("scale") == 0,
               F.expr("transform(_v, x -> cast(0 AS tinyint))")) \
        .otherwise(F.expr(
            "transform(_v, x -> cast(round(x / scale) AS tinyint))"))
    return base.select("vec_id", "scale", q.alias("q"))


def dequantize_embeddings(qdf: DataFrame) -> DataFrame:
    """(vec_id, scale, q) → (vec_id, v:array<double>) — the read path."""
    return qdf.select("vec_id",
                      F.expr("transform(q, x -> cast(x AS double) * scale)")
                      .alias("v"))


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011): split d dims into m subspaces, learn ksub
# centroids per subspace, store each vector as m small codes (here m bytes:
# 64-dim float64 -> 4 bytes, 128x).  Queries score candidates via ADC
# (asymmetric distance computation): a per-query distance TABLE of
# m x ksub entries, then each candidate costs m array lookups — no
# candidate-side float math at all.  Deterministic end-to-end (first-ksub
# seeding, rounded-distance argmin with centroid tie-break), so the whole
# pipeline is SQL-oracle-able like the IVF path.
# ---------------------------------------------------------------------------

def _d2_expr(a: str, b: str) -> F.Column:
    """Squared L2 via the expanded dot form aa - 2ab + bb — the same
    algebra the DuckDB oracle runs (list_dot_product), so both engines
    agree at the 4-dp rounding the rankings use."""
    return F.expr(f"({_DOT.format(a=a, b=a)}) - 2 * "
                  f"({_DOT.format(a=a, b=b)}) + ({_DOT.format(a=b, b=b)})")


def _subspace_explode(df: DataFrame, vec_col: str, m: int,
                      dsub: int) -> DataFrame:
    subs = ", ".join(
        f"struct({s} AS subspace, "
        f"slice({vec_col}, {s * dsub + 1}, {dsub}) AS sv)"
        for s in range(m))
    return (df.withColumn("_s", F.explode(F.expr(f"array({subs})")))
            .select(*[c for c in df.columns if c != vec_col],
                    F.col("_s.subspace").alias("subspace"),
                    F.col("_s.sv").alias("sv")))


def pq_centroids(cands: DataFrame, m: int = 4, ksub: int = 16,
                 d: int = 64) -> DataFrame:
    """Per-subspace codebooks, deterministically seeded from the first
    ``ksub`` vectors by vec_id (same contract as ``ivf_centroids``; at
    corpus scale seed from a hash-sample instead — the construction is
    unchanged).  Output: (subspace, centroid_id, cv)."""
    dsub = d // m
    w = Window.orderBy("vec_id")
    seeds = (cands.orderBy("vec_id").limit(ksub)
             .withColumn("centroid_id", F.row_number().over(w) - 1))
    return (_subspace_explode(seeds, "v", m, dsub)
            .select("subspace", "centroid_id", F.col("sv").alias("cv")))


def pq_encode(cands: DataFrame, cents: DataFrame, m: int = 4,
              d: int = 64) -> DataFrame:
    """Encode each vector as its per-subspace nearest codebook entry:
    subvector explode (m narrow rows per vector), broadcast codebook
    join, argmin on the 4-dp-rounded squared L2 with centroid_id
    tie-break (the cross-engine determinism contract), re-packed to an
    m-byte ``codes`` array ordered by subspace.  One shuffle (the
    per-vector re-pack); the corpus never crosses the network as
    floats."""
    dsub = d // m
    sub = _subspace_explode(cands.select("vec_id", "v"), "v", m, dsub)
    j = (sub.join(F.broadcast(cents), "subspace")
         .withColumn("d2", F.round(_d2_expr("sv", "cv"), 4)))
    w = (Window.partitionBy("vec_id", "subspace")
         .orderBy(F.col("d2").asc(), F.col("centroid_id").asc()))
    best = j.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (best.groupBy("vec_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("subspace", "centroid_id"))),
                lambda x: x["centroid_id"].cast("tinyint"))
                .alias("codes")))


def pq_topk(queries: DataFrame, cents: DataFrame, codes: DataFrame,
            k: int = 5, m: int = 4, ksub: int = 16,
            d: int = 64) -> DataFrame:
    """ADC top-k: per query build the m×ksub distance table ONCE
    (queries × broadcast codebook, rounded entries ordered by
    (subspace, centroid_id)), broadcast the tables over the codes
    relation, and score each candidate as m array lookups inside one
    codegen'd HOF — no per-candidate float math, no explode of the
    corpus side, and the final cut is the shared rank-window contract
    (ascending rounded distance, neighbor_id tie-break)."""
    dsub = d // m
    qsub = _subspace_explode(
        queries.select(F.col("vec_id").alias("query_id"), "v"),
        "v", m, dsub)
    qd = (qsub.join(F.broadcast(cents), "subspace")
          .withColumn("d2", F.round(_d2_expr("sv", "cv"), 4)))
    dtab = (qd.groupBy("query_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("subspace", "centroid_id", "d2"))),
                lambda x: x["d2"]).alias("dtab")))
    adc = (f"aggregate(zip_with(codes, sequence(0, {m - 1}), "
           f"(c, s) -> element_at(dtab, s * {ksub} + c + 1)), "
           f"0D, (acc, x) -> acc + x)")
    scored = (codes.crossJoin(F.broadcast(dtab))
              .withColumn("pq_dist", F.round(F.expr(adc), 4)))
    w = Window.partitionBy("query_id").orderBy(F.col("pq_dist").asc(),
                                               F.col("vec_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {k}")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "pq_dist", F.col("rnk").cast("int").alias("rnk")))


def ivfpq_topk(queries: DataFrame, cands: DataFrame, k: int = 5,
               n_centroids: int = 8, n_probe: int = 2, m: int = 4,
               ksub: int = 16, d: int = 64) -> DataFrame:
    """IVF-PQ (the FAISS `IVFx,PQy` layout, no-residual variant): the
    coarse quantizer prunes candidates to the probed inverted lists —
    1/n_centroids of the corpus per probe — and PQ ADC scores ONLY those
    candidates, so query cost is (pruned candidate count) × m array
    lookups with zero full-width float math after the probe step.  Both
    stages reuse their standalone deterministic constructions
    (`ivf_centroids`/`ivf_assign`, `pq_centroids`/`pq_encode`), so the
    composition stays SQL-oracle-able end-to-end.  Returned distance is
    the PQ approximation (rounded, neighbor tie-break); rerank against
    the float store (as `ann_ivf_q_topk` does for int8) if exact order
    matters."""
    coarse = ivf_centroids(cands, n_centroids)
    lists = (ivf_assign(cands, coarse, n_probe=1)
             .select(F.col("vec_id").alias("neighbor_id"), "centroid_id"))
    cents = pq_centroids(cands, m=m, ksub=ksub, d=d)
    codes = pq_encode(cands, cents, m=m, d=d)
    probes = (ivf_assign(queries, coarse, n_probe=n_probe)
              .select(F.col("vec_id").alias("query_id"), "centroid_id"))
    cand_pairs = (probes.join(lists, "centroid_id")
                  .select("query_id", "neighbor_id").distinct())
    dsub = d // m
    qsub = _subspace_explode(
        queries.select(F.col("vec_id").alias("query_id"), "v"),
        "v", m, dsub)
    qd = (qsub.join(F.broadcast(cents), "subspace")
          .withColumn("d2", F.round(_d2_expr("sv", "cv"), 4)))
    dtab = (qd.groupBy("query_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("subspace", "centroid_id", "d2"))),
                lambda x: x["d2"]).alias("dtab")))
    adc = (f"aggregate(zip_with(codes, sequence(0, {m - 1}), "
           f"(c, s) -> element_at(dtab, s * {ksub} + c + 1)), "
           f"0D, (acc, x) -> acc + x)")
    scored = (cand_pairs
              .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
                    "neighbor_id")
              .join(F.broadcast(dtab), "query_id")
              .withColumn("pq_dist", F.round(F.expr(adc), 4)))
    w = Window.partitionBy("query_id").orderBy(F.col("pq_dist").asc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {k}")
            .select("query_id", "neighbor_id", "pq_dist",
                    F.col("rnk").cast("int").alias("rnk")))


def ivf_index_stats(spark, path: str) -> DataFrame:
    """Observability census for the (possibly segmented) IVF index —
    the frozen-quantizer DRIFT detector: one row (n_vectors, n_lists,
    max_list, imbalance, n_segments) where ``imbalance`` =
    max list size / mean list size.  Appending a drifted distribution
    crowds new vectors into few lists, so a rising imbalance is the
    scheduled-rebuild trigger the append docstring prescribes — this
    row is how a pipeline watches for it without scanning vectors."""
    man = _read_ivf_manifest(path)
    lists = _read_lists_dir(spark, man["segments"][0])
    for s in man["segments"][1:]:
        lists = lists.unionByName(_read_lists_dir(spark, s))
    per = lists.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.coalesce(F.max("n"), F.lit(0)).cast("bigint").alias("max_list"),
        F.round(F.max("n") / F.avg("n"), 4).alias("imbalance")) \
        .withColumn("n_segments",
                    F.lit(len(man["segments"])).cast("int"))
