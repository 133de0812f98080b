"""Reference sample programs (Sample/*.andl) re-expressed Spark-first —
the parity evidence that andl_spark covers Andl's generative/recursive
idioms, not just relational queries."""

from pyspark.sql import functions as F

from andl_spark import Relation
from andl_spark.operators.joins import compose
from andl_spark.operators.whileop import fixpoint, fixpoint_with_level


def test_100_doors(spark):
    """Sample/100doors.andl: doors 1..100, door N toggled once per
    divisor; open doors are the perfect squares. seq + cross join +
    xor-fold (bool aggregation)."""
    doors = Relation.seq(spark, 100, "N").extend(N=F.col("N") + 1).df
    passes = doors.select(F.col("N").alias("P"))
    toggled = (
        doors.crossJoin(passes)
        .filter(F.col("N") % F.col("P") == 0)
        .groupBy("N")
        # fold(xor, ...) — odd number of divisors => open
        .agg((F.count(F.lit(1)) % 2 == 1).alias("open"))
    )
    open_doors = sorted(r["N"] for r in toggled.filter("open").collect())
    assert open_doors == [i * i for i in range(1, 11)]


def test_fibonacci_while(spark):
    """Sample/fibonacci.andl second implementation: fixpoint carrying
    (N, fib, fibx)."""
    seed = spark.createDataFrame([(1, 1.0, 0.0)], "N long, fib double, fibx double")
    out = fixpoint(
        seed,
        lambda fr: fr.select(
            (F.col("N") + 1).alias("N"),
            (F.col("fib") + F.col("fibx")).alias("fib"),
            F.col("fib").alias("fibx"),
        ).filter(F.col("N") <= 20),
    )
    fibs = {r["N"]: r["fib"] for r in out.collect()}
    assert fibs[10] == 55.0 and fibs[20] == 6765.0


def test_99_bottles(spark):
    """Sample/99bottles.andl: seq + string building, descending order."""
    lines = (
        Relation.seq(spark, 99, "n")
        .extend(n=99 - F.col("n"))  # 99..1
        .extend(
            line=F.concat(
                F.col("n").cast("string"), F.lit(" bottles of beer on the wall, "),
                F.col("n").cast("string"), F.lit(" bottles of beer."),
            )
        )
        .order_display("-n")
        .df.collect()
    )
    assert lines[0]["line"].startswith("99 bottles")
    assert lines[-1]["line"].startswith("1 bottles")


def test_orgchart_levels(spark):
    """Sample/recursive.andl:20-27 — flatten the org chart to levels
    via `{{boss := name, level := level+1}} compose orgchart`."""
    org = spark.createDataFrame(
        [("Bob", "Alice"), ("Cindy", "Alice"), ("Dave", "Bob"),
         ("Emma", "Bob"), ("Fred", "Cindy"), ("Gail", "Cindy")],
        "name string, boss string",
    )
    seed = spark.createDataFrame([("Alice", 0)], "name string, level int")

    def step(fr):
        renamed = fr.select(F.col("name").alias("boss"), (F.col("level") + 1).alias("level"))
        return compose(renamed, org)  # common col: boss → yields (level, name)

    out = fixpoint_with_level(seed, step)
    levels = {r["name"]: r["level"] for r in out.collect()}
    assert levels == {"Alice": 0, "Bob": 1, "Cindy": 1, "Dave": 2,
                      "Emma": 2, "Fred": 2, "Gail": 2}


def test_transitive_closure_mm(spark):
    """recursive.andl:34-38 — part explosion closure (MM.csv shape)."""
    mm = spark.createDataFrame(
        [("P1", "P2"), ("P1", "P3"), ("P2", "P4"), ("P3", "P4"), ("P4", "P5")],
        "major string, minor string",
    )
    seed = mm
    step = lambda fr: fr.select(F.col("major"), F.col("minor").alias("z")).join(
        mm.select(F.col("major").alias("z"), "minor"), "z"
    ).select("major", "minor")
    closure = fixpoint(seed, step)
    pairs = {(r["major"], r["minor"]) for r in closure.collect()}
    assert ("P1", "P5") in pairs and ("P2", "P5") in pairs
    assert len(pairs) == 9


def test_mandelbrot(spark):
    """Sample/mandelbrot.andl: the full program as q_mandelbrot — a
    28-deep .while() fixpoint over a 64x21 complex grid, max-fold, and
    ordered fold(&) rendering each scan line."""
    from andl_spark.workload import QUERIES

    art = {r["cy"]: r["t"] for r in QUERIES["q_mandelbrot"](spark, None).collect()}
    assert len(art) == 21
    lines = [art[k] for k in sorted(art)]
    assert all(len(t) == 64 for t in lines)
    # the set is symmetric about the x-axis: cy=-1.0+0.1k pairs up
    assert lines[0] == lines[-1] and lines[5] == lines[-6]
    # interior of the cardioid never escapes -> '#'; far left escapes fast
    mid = art[min(art, key=abs)]
    assert "#" in mid and mid.startswith(" ")


def test_sudoku_solver(spark):
    """Sample/sudoku.andl: the logic-only solver fully solves the
    reference's puzzle; every row/col/box holds digits 1..9 and all
    clues are preserved."""
    from andl_spark.workload import QUERIES

    puzzle = ("53..7....6..195....98....6.8...6...34..8.3..17...2...6"
              ".6....28....419..5....8..79")
    sol = {r["index"]: r["ndigit"] for r in QUERIES["q_sudoku"](spark, None).collect()}
    assert len(sol) == 81
    grid = [sol[i] for i in range(81)]
    for i, c in enumerate(puzzle):
        if c != ".":
            assert grid[i] == int(c)
    full = set(range(1, 10))
    for r in range(9):
        assert {grid[r * 9 + c] for c in range(9)} == full
    for c in range(9):
        assert {grid[r * 9 + c] for r in range(9)} == full
    for b in range(9):
        cells = {grid[(b // 3 * 3 + r) * 9 + (b % 3 * 3 + c)] for r in range(3) for c in range(3)}
        assert cells == full


def test_family_tree_tranclo(spark):
    """Sample/family_tree.andl: tranclo(xy) — transitive closure
    formulated exactly as the reference's recursive function: each pass
    composes the whole relation with itself (x->z . z->y => x->y) and
    unions, until the relation stops growing. Non-linear (whole-set)
    recursion on fixpoint_naive + compose."""
    import pyspark.sql.functions as F
    from andl_spark.operators.whileop import fixpoint_naive

    # tiny 3-generation tree: child -> father edges
    edges = [(1, 3), (2, 3), (3, 5), (4, 5), (5, 7), (6, 7)]
    xy = spark.createDataFrame(edges, "x int, y int")

    def step(cur):
        l = cur.select("x", F.col("y").alias("z"))
        r = cur.select(F.col("x").alias("z"), "y")
        return compose(l, r).unionByName(cur)

    closure = {(r["x"], r["y"]) for r in fixpoint_naive(xy, step).collect()}
    # expected: ancestors along father links
    exp = set(edges) | {(1, 5), (2, 5), (3, 7), (4, 7), (1, 7), (2, 7)}
    assert closure == exp


def test_user_defined_types_join(spark, spdb):
    """sample4.andl userdemo: user-defined scalar types (type sid(text))
    wrapping join attributes. Spark-first: a UDT is a single-field
    struct column — struct equality gives the same natural-join
    behavior, and the wrapped value stays JVM-typed."""
    def udt(col):
        return F.struct(F.col(col).alias("text"))

    S, P, SP = spdb["S"], spdb["P"], spdb["SP"]
    supp = S.select(udt("S#").alias("Sid"), F.col("SNAME").alias("Sname"))
    part = P.select(udt("P#").alias("Pid"), F.col("PNAME").alias("Pname"))
    supppart = SP.select(udt("S#").alias("Sid"), udt("P#").alias("Pid"), F.col("QTY").alias("Qty"))
    joined = compose(compose(supp, supppart), part)
    assert joined.count() == SP.count()
    # wrapped key round-trips: unwrap matches the raw join result
    raw = (
        SP.join(S, "S#").join(P, "P#")
        .select("SNAME", "PNAME", "QTY")
    )
    unwrapped = joined.select(
        F.col("Sname").alias("SNAME"), F.col("Pname").alias("PNAME"), F.col("Qty").alias("QTY")
    )
    assert unwrapped.exceptAll(raw).count() == 0 and raw.exceptAll(unwrapped).count() == 0
