"""Property tests for the vocabulary/packing/bloom KERNELS (pure
functions — no Ray session needed, so hypothesis can afford hundreds of
examples)."""

import numpy as np
import pandas as pd

try:
    from hypothesis import given, settings, strategies as st

    _WORD = st.text(alphabet=st.sampled_from("abcXYZ0é"), min_size=1, max_size=4)
    _DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(docs=st.lists(_DOC, min_size=0, max_size=8), n=st.integers(1, 3))
    def test_ngram_partial_matches_naive(docs, n):
        """The polars n-gram combiner == a naive Python count: lowercase
        \\S+ tokens, n-grams never crossing document boundaries."""
        from p5_rdf_rdb2rdf_ray.stages.vocab import _ngram_partial

        df = pd.DataFrame({"text": docs})
        t = _ngram_partial(df, n, "text", lowercase=True)
        got = dict(
            zip(t.column("ngram").to_pylist(), t.column("count").to_pylist())
        )
        want: dict[str, int] = {}
        for d in docs:
            toks = d.lower().split()
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                want[g] = want.get(g, 0) + 1
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(
        tok=st.lists(st.integers(1, 50), min_size=0, max_size=60),
        budget=st.integers(1, 60),
    )
    def test_pack_bounds_greedy_invariants(tok, budget):
        from p5_rdf_rdb2rdf_ray.stages.vocab import _pack_bounds

        a = np.array(tok, np.int64)
        b = _pack_bounds(a, budget)
        # partition of [0, n): strictly monotone, covers everything
        assert b[0] == 0 and b[-1] == len(a)
        assert (np.diff(b) >= 1).all() or len(a) == 0
        for s, e in zip(b[:-1], b[1:]):
            seg = a[s:e]
            # within budget, unless a single oversized chunk
            assert seg.sum() <= budget or len(seg) == 1
            # greedy-maximal: the next chunk would not have fit
            if e < len(a) and seg.sum() <= budget:
                assert seg.sum() + a[e] > budget

    @settings(max_examples=150, deadline=None)
    @given(
        ref=st.lists(st.integers(0, 2**64 - 1), max_size=40),
        probe=st.lists(st.integers(0, 2**64 - 1), max_size=40),
        bits=st.integers(4, 24),
    )
    def test_bloom_no_false_negatives(ref, probe, bits):
        from p5_rdf_rdb2rdf_ray.stages.dedup import _bloom_build, _bloom_query

        rs = np.array(ref, np.uint64)
        bloom, m, k = _bloom_build(rs, bits, k=6)
        # every inserted key MUST hit
        assert _bloom_query(bloom, m, k, rs).all()
        # probes give booleans of the right shape (false positives allowed)
        qs = np.array(probe, np.uint64)
        out = _bloom_query(bloom, m, k, qs)
        assert out.shape == qs.shape
        hits_true = np.isin(qs, rs)
        assert (out | ~hits_true).all()  # member ⇒ hit

    _SUBJ = st.sampled_from(["s1", "s2", "s3", "s4"])
    _VAL = st.sampled_from(["a", "b", "_:x", "http://e/1", "é", ""])

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                _SUBJ,
                st.sampled_from(["p1", "p2", "p3"]),
                _VAL,
                st.sampled_from([0, 2]),  # IRI | literal kind
            ),
            min_size=0,
            max_size=20,
            unique_by=lambda r: (r[0], r[1]),  # DM: one triple per (s, p)
        ),
        lit_val=_VAL,
        use_lit=st.booleans(),
    )
    def test_star_pivot_matches_naive_join(rows, lit_val, use_lit):
        """The within-frame star pivot == a naive nested-loop inner join
        over (pred → var / bound-literal) items, for any subject-complete
        triple frame (NULL-city-style absences, unicode, bnode prefixes,
        literal-vs-IRI kinds)."""
        from p5_rdf_rdb2rdf_ray.engine.lookup import _star_pivot

        df = pd.DataFrame(
            {
                "subj": [r[0] for r in rows],
                "pred": [r[1] for r in rows],
                "obj": [r[2] for r in rows],
                "obj_kind": pd.array([r[3] for r in rows], dtype="uint8"),
            }
        )
        plan = (("p1", "v1"), ("p2", ("lit", lit_val)) if use_lit else ("p2", "v2"))
        t = _star_pivot(df, plan, "s")
        got = set()
        for i in range(t.num_rows):
            row = {c: t.column(c)[i].as_py() for c in t.column_names}
            got.add((row["s"], row["v1"], row.get("v2")))
        by_subj: dict = {}
        for s, p, o, k in rows:
            by_subj.setdefault(s, {})[p] = (o, k)
        want = set()
        for s, preds in by_subj.items():
            if "p1" not in preds:
                continue
            if use_lit:
                if preds.get("p2", (None, None)) == (lit_val, 2):
                    want.add((s, preds["p1"][0], None))
            else:
                if "p2" in preds:
                    want.add((s, preds["p1"][0], preds["p2"][0]))
        assert got == want


except ImportError:  # pragma: no cover — hypothesis is in the sandbox
    pass
