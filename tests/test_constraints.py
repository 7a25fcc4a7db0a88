"""The declarative constraint checker on deliberately dirty data: every
constraint type must count its violations exactly (the z14 oracle gate
only sees the all-pass path on clean synthetic tables)."""


def test_constraints_count_violations_exactly(spark):
    from pyspark_distributed_kmodes_spark.operators.constraints import (
        ForeignKey,
        InRange,
        InSet,
        NotNull,
        Unique,
        check_constraints,
    )

    rows = [
        (1, 10, "A", 5.0),
        (1, 10, "A", 5.0),  # duplicate id (unique violation)
        (2, 11, "B", -1.0),  # range violation
        (3, None, "C", 2.0),  # null fk col (not_null violation; fk skips nulls)
        (4, 99, "Z", 3.0),  # fk violation (99 not a parent) + set violation (Z)
        (5, 12, "A", 1000.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, fk bigint, cat string, x double")
    parent = spark.createDataFrame([(10,), (11,), (12,)], "pid bigint")

    out = check_constraints(
        spark,
        df,
        [
            NotNull("fk"),
            InRange("x", 0.0, 100.0),
            InSet("cat", ("A", "B", "C")),
            Unique(("id",)),
            ForeignKey("fk", "parent", "pid"),
        ],
        parents={"parent": parent},
    ).collect()
    got = {r.check_name: (r.n_violations, r.status) for r in out}
    assert got["not_null(fk)"] == (1, "fail")
    assert got["in_range(x,0.0,100.0)"] == (2, "fail")  # -1.0 and 1000.0
    assert got["in_set(cat)"] == (1, "fail")
    assert got["unique(id)"] == (1, "fail")  # one extra row for id=1
    assert got["fk(fk->parent.pid)"] == (1, "fail")  # fk=99


def test_constraints_all_pass_on_clean_data(spark):
    from pyspark_distributed_kmodes_spark.operators.constraints import (
        NotNull,
        Unique,
        check_constraints,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    out = check_constraints(spark, df, [NotNull("s"), Unique(("id",))]).collect()
    assert all(r.status == "pass" and r.n_violations == 0 for r in out)
