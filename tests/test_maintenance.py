"""Table maintenance: CDC replay composition law, tombstone semantics,
and SCD-2 interval integrity + shuffle budget."""

from pyspark.sql import functions as F

from legal_ner_spark.plans import maintenance as mt


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, ["user_id", "seq", "op", "val"])


def test_cdc_tombstone_upsert_passthrough(spark):
    """D deletes a base key, U/I upserts, untouched base rows pass
    through, and a delete-then-reinsert key survives with the NEW
    value (latest change wins, not 'any D kills')."""
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["user_id", "val"])
    log = _changes(spark, [
        (1, 10, "D", None),          # delete base key
        (2, 10, "U", "b2"),          # update base key
        (4, 10, "I", "d"),           # insert new key
        (5, 10, "I", "e"), (5, 11, "D", None), (5, 12, "I", "e2"),
        (6, 10, "I", "f"), (6, 11, "D", None),  # net delete of non-base
    ])
    out = {r.user_id: r.val
           for r in mt.cdc_apply(base, log, ["user_id"], ["val"],
                                 ["seq"]).collect()}
    assert out == {2: "b2", 3: "c", 4: "d", 5: "e2"}


def test_cdc_split_composition_law(spark):
    """apply(apply(base, first_half), second_half) must equal
    apply(base, whole_log) for EVERY split point — the property that
    makes incremental daily applies equivalent to a full rebuild."""
    rows = [((v * 7) % 13, v, "DIU"[v % 3], f"v{v}") for v in range(60)]
    base = spark.createDataFrame([(k, "base") for k in range(5)],
                                 ["user_id", "val"])
    log = _changes(spark, rows)
    whole = sorted(
        (r.user_id, r.val)
        for r in mt.cdc_apply(base, log, ["user_id"], ["val"],
                              ["seq"]).collect())
    for cut in (1, 20, 45, 59):
        snap = mt.cdc_apply(base, log.filter(F.col("seq") < cut),
                            ["user_id"], ["val"], ["seq"])
        two = sorted(
            (r.user_id, r.val)
            for r in mt.cdc_apply(snap, log.filter(F.col("seq") >= cut),
                                  ["user_id"], ["val"],
                                  ["seq"]).collect())
        assert two == whole, f"split at {cut} diverged"


def test_cdc_composition_randomized_logs(spark):
    """Property sweep without per-example Spark overhead: 25 seeded
    random logs (varying lengths, delete/re-insert patterns, some
    entirely inside one half — so the other half-apply must be an
    IDENTITY pass-through) share one frame via key prefixing; the
    composition law must hold for every log at the common split."""
    import random
    rng = random.Random(7)
    rows = []
    for log in range(25):
        for seq in range(rng.randint(1, 40)):
            rows.append((f"{log}:{rng.randint(0, 6)}", seq,
                         rng.choice("IUD"), f"{log}v{seq}"))
    df = spark.createDataFrame(rows, ["k", "seq", "op", "val"])
    empty = spark.createDataFrame([], "k string, val string")
    whole = sorted(
        (r.k, r.val)
        for r in mt.cdc_apply(empty, df, ["k"], ["val"],
                              ["seq"]).collect())
    snap = mt.cdc_apply(empty, df.filter(F.col("seq") < 10),
                        ["k"], ["val"], ["seq"])
    two = sorted(
        (r.k, r.val)
        for r in mt.cdc_apply(snap, df.filter(F.col("seq") >= 10),
                              ["k"], ["val"], ["seq"]).collect())
    assert two == whole


def test_scd2_interval_integrity_and_asof_reconstruction(spark):
    """Per key: version_n is 1..n contiguous, valid_to chains to the
    next valid_from, only the last version is open, consecutive attrs
    differ; and EVERY source change's attr equals the attr of the
    version whose interval covers its timestamp (the as-of join
    round-trip that is the whole point of the SCD-2 shape)."""
    rows = [((v * 3) % 7, v, None, "xxyyzx"[v % 6]) for v in range(80)]
    log = spark.createDataFrame(
        rows, "user_id int, seq int, op string, val string") \
        .drop("op").withColumnRenamed("val", "attr_in")
    out = mt.scd2_versions(log, ["user_id"], "attr_in", "seq").collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.version_n)):
        by_key.setdefault(r.user_id, []).append(r)
    assert set(by_key) == {(v * 3) % 7 for v in range(80)}
    for vs in by_key.values():
        assert [v.version_n for v in vs] == list(range(1, len(vs) + 1))
        assert all(a.valid_to == b.valid_from
                   for a, b in zip(vs, vs[1:]))
        assert vs[-1].valid_to is None
        assert all(v.valid_to is not None for v in vs[:-1])
        assert all(a.attr != b.attr for a, b in zip(vs, vs[1:]))
    for uid, seq, _, attr in rows:
        (ver,) = [v for v in by_key[uid]
                  if v.valid_from <= seq
                  and (v.valid_to is None or seq < v.valid_to)]
        assert ver.attr == attr


def test_scd2_null_attr_runs(spark):
    """A run of NULL attributes is ONE version (null-safe change-point),
    and NULL→value→NULL produces three."""
    log = spark.createDataFrame(
        [(1, 0, None), (1, 1, None), (1, 2, "a"), (1, 3, None)],
        "user_id int, seq int, attr_in string")
    out = sorted(mt.scd2_versions(log, ["user_id"], "attr_in",
                                  "seq").collect(),
                 key=lambda r: r.version_n)
    assert [(r.attr, r.valid_from) for r in out] == \
        [(None, 0), ("a", 2), (None, 3)]


def test_asof_dimension_join_boundaries_and_leakage(spark):
    """Facts see the version valid AT their timestamp: a fact exactly on
    a boundary takes the NEW version ([from, to) convention), a fact
    before any version gets NULL, and a LATER version never leaks
    backwards; equal-valid_from versions resolve to the higher
    version_n."""
    from legal_ner_spark.plans import maintenance as mt
    versions = spark.createDataFrame(
        [(1, 1, 10, "a"), (1, 2, 20, "b"),
         (2, 1, 50, "x"), (2, 2, 50, "y")],   # same valid_from ties
        "user_id int, version_n int, valid_from int, attr string")
    facts = spark.createDataFrame(
        [(1, 100, 5), (1, 101, 10), (1, 102, 15), (1, 103, 20),
         (1, 104, 99), (2, 200, 50), (3, 300, 7)],
        "user_id int, fact_id int, ts int")
    out = {r.fact_id: r.attr
           for r in mt.asof_dimension_join(
               facts, versions, ["user_id"], "attr", "ts",
               valid_from_col="valid_from",
               version_order_col="version_n").collect()}
    assert out == {100: None,   # before any version
                   101: "a",    # boundary: new version applies AT ts
                   102: "a",
                   103: "b",    # no leak of b before 20, applies at 20
                   104: "b",
                   200: "y",    # tie on valid_from → higher version_n
                   300: None}   # key with no dimension at all


def test_scd2_single_exchange(spark):
    """The run filter and both window passes must share ONE hash
    exchange on the key — a second shuffle here doubles the cost of
    every dimension rebuild at 100 TB."""
    log = _changes(spark, [(1, 0, "I", "a")]).drop("op") \
        .withColumnRenamed("val", "attr_in")
    plan = mt.scd2_versions(log, ["user_id"], "attr_in", "seq") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
