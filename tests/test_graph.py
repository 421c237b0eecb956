"""Integer PageRank (operators/graph.py): exact-diffusion semantics on
hand-checked graphs, mass conservation, and degree ordering."""

from __future__ import annotations

from odin_rs_spark.operators.graph import bidirect, integer_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bidirect_dedup_and_self_loops(spark):
    e = bidirect(_edges(spark, [(1, 2), (2, 1), (1, 1), (2, 3)]))
    got = sorted((r["src"], r["dst"]) for r in e.collect())
    # bidirected, self-loop dropped, (1,2)/(2,1) deduped
    assert got == [(1, 2), (2, 1), (2, 3), (3, 2)]


def test_hand_checked_diffusion_path_graph(spark):
    """Path 1-2-3, one iteration, M0=1000:
    deg: 1→1, 2→2, 3→1.
    share: node1 (1000//2)//1=500; node2 (1000//2)//2=250; node3 500.
    retained: 1→500, 2→500, 3→500.
    inflow: 1←250, 2←500+500, 3←250.
    mass': 1→750, 2→1500, 3→750. Total conserved = 3000."""
    pr = integer_pagerank(
        _edges(spark, [(1, 2), (2, 3)]), iterations=1, initial_mass=1000
    )
    got = {r["node"]: r["mass"] for r in pr.collect()}
    assert got == {1: 750, 2: 1500, 3: 750}


def test_mass_conserved_and_hub_wins(spark):
    # star: hub 0 connected to 1..6, plus a 7-8 pendant pair
    pairs = [(0, i) for i in range(1, 7)] + [(7, 8)]
    pr = integer_pagerank(_edges(spark, pairs), iterations=8, initial_mass=10_000)
    got = {r["node"]: r["mass"] for r in pr.collect()}
    assert sum(got.values()) == 9 * 10_000  # exact conservation
    assert got[0] == max(got.values())  # the hub accumulates the most
    assert got[7] == got[8]  # symmetric pendant pair stays symmetric


def test_iteration_determinism_across_parallelism(spark):
    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)]
    a = integer_pagerank(_edges(spark, pairs), iterations=5)
    b = integer_pagerank(
        _edges(spark, pairs).repartition(7), iterations=5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestIntegerHits:
    def test_known_hub_and_authority(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.operators.graph import integer_hits

        # star: node 0 points at 1,2,3 (pure hub); 1,2,3 also point at 4
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4)],
            "src bigint, dst bigint",
        )
        out = {r.node: (r.hub, r.authority) for r in integer_hits(edges, 1).collect()}
        # after one iteration from h0=1: a(d) = indegree, h(s) = sum a(out)
        assert out[4][1] == 3          # authority: 3 in-edges
        assert out[0][0] == 3          # hub 0: a(1)+a(2)+a(3) = 1+1+1
        assert out[1][0] == 3          # hub 1: a(4) = 3
        assert out[0][1] == 0          # no in-edges -> zero authority
        assert out[4][0] == 0          # no out-edges -> zero hub


class TestTriangleCount:
    def test_k4_complete_graph(self, spark):
        from odin_rs_spark.operators.graph import triangle_count

        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r for r in triangle_count(df).collect()}
        # K4: every node sits in C(3,2)=3 triangles, degree 3
        assert all(out[n].triangles == 3 and out[n].degree == 3 for n in range(4))

    def test_star_has_no_triangles(self, spark):
        from odin_rs_spark.operators.graph import triangle_count

        df = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long"
        )
        out = triangle_count(df).collect()
        assert all(r.triangles == 0 for r in out)
        assert {r.node: r.degree for r in out}[0] == 5

    def test_canonicalization_dedups_and_drops_loops(self, spark):
        from odin_rs_spark.operators.graph import triangle_count

        # triangle 1-2-3 given with duplicates, reversals and a loop
        rows = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 3)]
        df = spark.createDataFrame(rows, "src long, dst long")
        out = {r.node: r.triangles for r in triangle_count(df).collect()}
        assert out == {1: 1, 2: 1, 3: 1}

    def test_node_ids_beyond_2_32_do_not_collide(self, spark):
        from odin_rs_spark.operators.graph import triangle_count

        # ids differing by exactly 2^32 would alias under a packed
        # degree*2^32+node key (ADVICE r10); the struct order must not.
        base = 1 << 32
        rows = [
            (1, 2), (2, 1 + base), (1, 1 + base),      # triangle
            (1, 2 + base), (2 + base, 2), (2, 1),       # same triangle shape shifted
        ]
        df = spark.createDataFrame(rows, "src long, dst long")
        out = {r.node: r.triangles for r in triangle_count(df).collect()}
        und = {(min(a, b), max(a, b)) for a, b in rows}
        naive: dict[int, int] = {}
        for a, b in sorted(und):
            for c in sorted({n for e in und for n in e}):
                if b < c and (b, c) in und and (a, c) in und:
                    for n in (a, b, c):
                        naive[n] = naive.get(n, 0) + 1
        assert {k: v for k, v in out.items() if v} == naive
        assert sum(out.values()) > 0

    def test_matches_naive_closure_on_random_graph(self, spark):
        from odin_rs_spark.operators.graph import triangle_count

        # deterministic pseudo-random graph on 30 nodes
        rows = [
            (i, (i * 7 + j * 13) % 30)
            for i in range(30)
            for j in range(4)
            if i != (i * 7 + j * 13) % 30
        ]
        df = spark.createDataFrame(rows, "src long, dst long")
        mine = {r.node: r.triangles for r in triangle_count(df).collect()}
        # naive: canonical edges, three-way closure a<b<c
        und = {(min(a, b), max(a, b)) for a, b in rows if a != b}
        naive: dict[int, int] = {}
        es = sorted(und)
        eset = set(und)
        for a, b in es:
            for c in range(30):
                if b < c and (b, c) in eset and (a, c) in eset:
                    for n in (a, b, c):
                        naive[n] = naive.get(n, 0) + 1
        assert {k: v for k, v in mine.items() if v} == naive
