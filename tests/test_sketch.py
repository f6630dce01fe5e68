"""KMV cardinality sketch (mergeability, exact small-group path,
estimator accuracy) and count-min sketch (upper-bound guarantee,
mergeability, bounded state)."""

from pyspark.sql import functions as F

from legal_ner_spark.operators import sketch


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, ["grp", "val"])


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct values must return the EXACT
    count (the sketch holds every hash), duplicates notwithstanding."""
    pairs = [("a", v % 10) for v in range(1000)] + \
            [("b", v) for v in range(63)]
    out = {r.grp: (r.sketch_size, r.est_distinct)
           for r in sketch.kmv_sketch(_rows(spark, pairs), "grp", "val",
                                      k=64).collect()}
    assert out["a"] == (10, 10.0)
    assert out["b"] == (63, 63.0)


def test_kmv_merge_equals_whole(spark):
    """THE sketch property: partials built over two disjoint halves of
    the data, unioned and merged, must produce the byte-identical sketch
    (digest included) as one pass over the whole — this is what lets
    per-day sketches roll into monthly without re-reading the corpus."""
    pairs = [("g", v * 7919 % 5000) for v in range(20000)]
    df = _rows(spark, pairs)
    whole = sketch.kmv_sketch(df, "grp", "val", k=64).collect()[0]
    p1 = sketch.kmv_partial(df.filter(F.col("val") % 2 == 0),
                            "grp", "val", k=64)
    p2 = sketch.kmv_partial(df.filter(F.col("val") % 2 == 1),
                            "grp", "val", k=64)
    merged = sketch.kmv_merge(p1.unionByName(p2), k=64).collect()[0]
    assert merged.sketch_digest == whole.sketch_digest
    assert merged.est_distinct == whole.est_distinct
    assert merged.sketch_size == whole.sketch_size == 64


def test_kmv_estimate_within_theory_band(spark):
    """(k-1)/U_(k) at k=256 has ~1/sqrt(254) ≈ 6.3% relative standard
    error; require the single-draw estimate within 4 sigma of the true
    4,096 distinct values."""
    pairs = [("g", v) for v in range(4096)]
    out = sketch.kmv_sketch(_rows(spark, pairs), "grp", "val",
                            k=256).collect()[0]
    assert out.sketch_size == 256
    assert abs(out.est_distinct - 4096) / 4096 < 4 / (254 ** 0.5)


def test_kmv_salting_bounds_partial_width(spark):
    """Every phase-1 partial must be capped at k hashes regardless of
    group size (the cap is what bounds the phase-2 shuffle)."""
    pairs = [("hot", v) for v in range(5000)]
    widths = [len(r.partial) for r in
              sketch.kmv_partial(_rows(spark, pairs), "grp", "val",
                                 k=32, n_salts=4).collect()]
    assert len(widths) == 4 and all(w == 32 for w in widths)


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["item"])


def test_cms_estimate_is_upper_bound_and_often_exact(spark):
    """CMS point queries never under-count (min over depth rows of summed
    cells), and with width 256 ≫ 50 distinct items, no collisions means
    every estimate is exactly the true count here."""
    vals = [v % 50 for v in range(5000)]
    cms = sketch.cms_build(_items(spark, vals), "item",
                           depth=4, width=256)
    est = {int(r.item): r.est
           for r in sketch.cms_query(cms, _items(spark, range(50)),
                                     "item", depth=4,
                                     width=256).collect()}
    true = {v: vals.count(v) for v in range(50)}
    assert all(est[v] >= true[v] for v in range(50))
    assert est == true  # collision-free at this load factor


def test_cms_merge_equals_whole(spark):
    """THE sketch property: sketches over two disjoint halves, unioned
    and groupBy-summed, must equal the one-pass sketch cell-for-cell —
    per-partition/per-day sketches roll up without the raw stream."""
    df = _items(spark, [v % 97 for v in range(10000)])
    whole = {(r.r, r.c): r.cnt
             for r in sketch.cms_build(df, "item", depth=4,
                                       width=64).collect()}
    p1 = sketch.cms_build(df.filter(F.col("item") % 2 == 0), "item",
                          depth=4, width=64)
    p2 = sketch.cms_build(df.filter(F.col("item") % 2 == 1), "item",
                          depth=4, width=64)
    merged = {(r.r, r.c): r.cnt
              for r in p1.unionByName(p2).groupBy("r", "c")
              .agg(F.sum("cnt").alias("cnt")).collect()}
    assert merged == whole


def test_cms_join_size_upper_bound_and_disjoint_zero(spark):
    """The inner-product estimate never under-counts the true equi-join
    size, is exact at this collision-free load factor, and disjoint
    key sets estimate exactly 0."""
    a = _items(spark, [1, 1, 1, 2, 3])        # key 1 ×3, 2 ×1, 3 ×1
    b = _items(spark, [1, 2, 2, 4])           # key 1 ×1, 2 ×2, 4 ×1
    true_size = 3 * 1 + 1 * 2                 # = 5 pairs
    sa = sketch.cms_build(a, "item", depth=4, width=256)
    sb = sketch.cms_build(b, "item", depth=4, width=256)
    est = sketch.cms_join_size(spark, sa, sb, depth=4).collect()[0]
    assert est.est_join_size >= true_size
    assert est.est_join_size == true_size     # no collisions at 5/256
    sc = sketch.cms_build(_items(spark, [99, 98]), "item",
                          depth=4, width=256)
    assert sketch.cms_join_size(spark, sa, sc,
                                depth=4).collect()[0].est_join_size == 0


def test_cms_state_bounded_and_unseen_items_zero(spark):
    """The sketch never exceeds depth×width cells no matter the input,
    and probing an item that never occurred returns 0 when its cells are
    empty (guaranteed here: 3 distinct items can't fill a row)."""
    cms = sketch.cms_build(_items(spark, [1, 2, 3] * 100), "item",
                           depth=3, width=512)
    assert cms.count() <= 3 * 512
    est = {int(r.item): r.est
           for r in sketch.cms_query(cms, _items(spark, [99999]),
                                     "item", depth=3,
                                     width=512).collect()}
    assert est[99999] == 0
