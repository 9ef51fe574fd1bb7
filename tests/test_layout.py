"""Layout operator tests: Morton interleave vs a Python bit-twiddling
reference, exact quantization bounds, and the locality property the
whole scheme exists for (z-adjacent rows are close in both source
dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.layout import (
    quantize,
    zorder_value,
)


def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y)


def test_zorder_is_bijective_on_domain(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    zs = [
        r.z
        for r in df.select(
            zorder_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    assert len(set(zs)) == 32 * 32
    assert min(zs) == 0 and max(zs) == _py_morton(31, 31)


def test_quantize_exact_bounds_and_degenerate_span(spark):
    df = spark.createDataFrame([(v,) for v in range(1000, 2001)], "v long")
    bound = df.crossJoin(
        df.agg(F.min("v").alias("lo"), (F.max("v") - F.min("v")).alias("sp"))
    )
    q = bound.select(
        "v", quantize(F.col("v"), F.col("lo"), F.col("sp")).alias("q")
    )
    got = {r.v: r.q for r in q.collect()}
    for v, qv in got.items():
        assert qv == ((v - 1000) * 255) // 1000  # exact floor division
    assert got[1000] == 0 and got[2000] == 255
    # span 0 (constant column) maps everything to 0, no div-by-zero
    const = spark.createDataFrame([(7,), (7,)], "v long")
    z = const.select(
        quantize(F.col("v"), F.lit(7), F.lit(0)).alias("q")
    ).collect()
    assert [r.q for r in z] == [0, 0]


def test_z_adjacency_implies_dimension_locality(spark):
    # Sorting by z-value, any 64-row chunk of the full 8-bit grid
    # covers at most a small sub-rectangle — the pruning property.
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    z = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z"))
    chunks = (
        z.select("x", "y", F.shiftright(F.col("z"), 6).alias("chunk"))
        .groupBy("chunk")
        .agg(
            (F.max("x") - F.min("x") + 1).alias("sx"),
            (F.max("y") - F.min("y") + 1).alias("sy"),
        )
        .collect()
    )
    # a perfect morton curve over a 64x64 grid: every 64-point chunk
    # is an exact 8x8 tile
    assert all(r.sx == 8 and r.sy == 8 for r in chunks)


def test_write_zordered_files_cover_compact_rectangles(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_bowl_2026_analytics_spark.sources.writers import (
        write_parquet,
        write_zordered,
    )

    # full 64x64 grid in row-major (natural) order
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    ).coalesce(4)

    zpath = str(tmp_path / "zord")
    npath = str(tmp_path / "nat")
    write_zordered(df, zpath, "x", "y", n_files=16)
    write_parquet(df.repartitionByRange(16, "x", "y"), npath)

    def spans(path):
        got = (
            spark.read.parquet(path)
            .select("x", "y", F.input_file_name().alias("f"))
            .groupBy("f")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("sx"),
                (F.max("y") - F.min("y") + 1).alias("sy"),
            )
            .collect()
        )
        n = len(got)
        return (
            sum(r.sx for r in got) / n,
            sum(r.sy for r in got) / n,
            n,
        )

    zx, zy, zn = spans(zpath)
    nx, ny, nn = spans(npath)
    assert zn == 16 and nn == 16
    # z-order: every file's rectangle is tight in BOTH dims; the
    # range-by-(x,y) layout is tight in x but spans all of y.
    assert zx <= 20 and zy <= 20
    assert ny >= 60
    # schema untouched (the _z key never reaches the files)
    assert set(spark.read.parquet(zpath).columns) == {"x", "y"}
