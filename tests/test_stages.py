"""Training-data stages vs brute-force oracles (dedup / similarity /
textstats / groupagg / multimodal / lookup pushdown)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.stages.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_aggregate, top_k
from p5_rdf_rdb2rdf_ray.stages.multimodal import (
    extract_features,
    sample_frames,
    synth_media_table,
)
from p5_rdf_rdb2rdf_ray.stages.similarity import (
    ann_topk,
    embedding_neardup_pairs,
    lsh_topk,
)
from p5_rdf_rdb2rdf_ray.stages.textstats import token_counts


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        words = [vocab[int(k)] for k in rng.integers(0, 30, size=40)]
        texts.append(" ".join(words))
    # engineered near-dups and exact dups
    texts.append(texts[0])                      # 80 = exact dup of 0
    texts.append(texts[1] + " w0 w1")           # 81 ≈ 1
    mutated = texts[2].split()
    mutated[5] = "w29"
    texts.append(" ".join(mutated))             # 82 ≈ 2
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def _shingles(t, n=3):
    w = t.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _true_pairs(texts, tau):
    out = set()
    S = [_shingles(t) for t in texts]
    for i in range(len(S)):
        for j in range(i + 1, len(S)):
            u = S[i] | S[j]
            if u and len(S[i] & S[j]) / len(u) >= tau:
                out.add((i, j))
    return out


def test_exact_dedup(ray_session, docs):
    got = exact_dedup(rd.from_arrow(docs), num_partitions=4).to_pandas()
    texts = docs.column("text").to_pylist()
    want = pd.Series(texts).groupby(texts).size()
    assert len(got) == len(set(texts))
    dup_rep = got[got.n_copies == 2]
    assert list(dup_rep.doc_id) == [0]  # min-id representative


def test_ngram_jaccard_pairs(ray_session, docs):
    texts = docs.column("text").to_pylist()
    got = ngram_jaccard_pairs(rd.from_arrow(docs), tau=0.5, num_partitions=4)
    gp = {(r["doc_a"], r["doc_b"]) for r in got.to_pandas().to_dict("records")}
    assert gp == _true_pairs(texts, 0.5)


def test_minhash_pairs_match_exact(ray_session, docs):
    texts = docs.column("text").to_pylist()
    got = minhash_pairs(rd.from_arrow(docs), tau=0.5, num_partitions=4)
    gp = {(r["doc_a"], r["doc_b"]) for r in got.to_pandas().to_dict("records")}
    assert gp == _true_pairs(texts, 0.5)


def test_minhash_pairs_distributed_verify(ray_session, docs):
    """broadcast_verify=False (semi-join verify) finds the same pairs."""
    texts = docs.column("text").to_pylist()
    got = minhash_pairs(
        rd.from_arrow(docs), tau=0.5, num_partitions=4, broadcast_verify=False
    )
    gp = {(r["doc_a"], r["doc_b"]) for r in got.to_pandas().to_dict("records")}
    assert gp == _true_pairs(texts, 0.5)


def test_minhash_auto_selects_verify_mode(ray_session, docs):
    """Auto mode (broadcast_verify=None, the default) counts candidates
    distributedly and flips to the semi-join path past
    auto_broadcast_max_pairs instead of trusting the caller — a
    candidates≈corpus fixture must take the distributed path by ITSELF,
    with identical results (round-3 verdict item #5)."""
    from p5_rdf_rdb2rdf_ray.stages import dedup as dd

    texts = docs.column("text").to_pylist()
    want = _true_pairs(texts, 0.5)

    # small corpus, default threshold → auto picks broadcast
    got = minhash_pairs(rd.from_arrow(docs), tau=0.5, num_partitions=4)
    gp = {(r["doc_a"], r["doc_b"]) for r in got.to_pandas().to_dict("records")}
    assert gp == want
    assert dd.last_verify_mode == "broadcast"

    # candidates exceed the (forced-tiny) threshold → auto picks semi,
    # same verified pairs
    got2 = minhash_pairs(
        rd.from_arrow(docs), tau=0.5, num_partitions=4,
        auto_broadcast_max_pairs=0,
    )
    gp2 = {
        (r["doc_a"], r["doc_b"]) for r in got2.to_pandas().to_dict("records")
    }
    assert gp2 == want
    assert dd.last_verify_mode == "semi"

    # explicit caller pin is honored and recorded as forced
    minhash_pairs(
        rd.from_arrow(docs), tau=0.5, num_partitions=4, broadcast_verify=True
    ).to_pandas()
    assert dd.last_verify_mode == "broadcast-forced"


def test_near_dedup_docs_components(ray_session):
    """pairs → CC → representative: a transitive chain (a~b, b~c with
    a≁c) collapses to ONE component with the min id as rep; singletons
    keep themselves."""
    from p5_rdf_rdb2rdf_ray.stages.dedup import near_dedup_docs

    # 20 words → 18 shingles; +4 words per step → pairwise J:
    # base~mid 18/22≈0.82, mid~far 22/26≈0.85, base~far 18/26≈0.69
    base = " ".join(f"w{i}" for i in range(20))
    mid = base + " x1 x2 x3 x4"
    far = mid + " y1 y2 y3 y4"
    t = pa.table(
        {
            "doc_id": pa.array([3, 10, 2, 7], pa.int64()),
            "text": [base, mid, far, "totally unrelated content " * 5],
        }
    )
    got = (
        # tau=0.75: base~mid and mid~far pair, base~far does NOT — the
        # component exists only through transitivity
        near_dedup_docs(rd.from_arrow(t), tau=0.75, method="jaccard")
        .to_pandas()
        .set_index("doc_id")
    )
    # 3~10 and 10~2 connect all three; min id 2 is the representative
    assert got.loc[3, "rep_id"] == 2 and not got.loc[3, "is_kept"]
    assert got.loc[10, "rep_id"] == 2 and not got.loc[10, "is_kept"]
    assert got.loc[2, "rep_id"] == 2 and got.loc[2, "is_kept"]
    assert got.loc[7, "rep_id"] == 7 and got.loc[7, "is_kept"]


def test_simhash_pairs_finds_exact_dup(ray_session, docs):
    got = simhash_pairs(rd.from_arrow(docs), max_hamming=3, num_partitions=4)
    gp = {(r["doc_a"], r["doc_b"]) for r in got.to_pandas().to_dict("records")}
    assert (0, 80) in gp  # identical docs → hamming 0
    for a, b in gp:
        assert a < b


def test_simhash_pairs_matches_bruteforce(ray_session):
    """The 16-bit-chunk pigeonhole + first-matching-chunk emission must
    return EXACTLY the Hamming ≤ 3 pairs (k ≤ 3 over 4 chunks guarantees
    one equal chunk), each exactly once — regression for a round-2 bug
    where the cross-chunk distinct silently dropped pairs."""
    from p5_rdf_rdb2rdf_ray.stages.dedup import simhash_signatures

    rng = np.random.default_rng(5)
    words = [f"tok{i}" for i in range(400)]
    texts = []
    for i in range(300):
        if i % 3 == 0 and i:  # every 3rd doc is a near-copy of doc i-1
            w = texts[i - 1].split()
            w[rng.integers(len(w))] = "swapped"
            texts.append(" ".join(w))
        else:
            texts.append(" ".join(rng.choice(words, 30)))
    t = pa.table(
        {"doc_id": pa.array(np.arange(300), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(t)
    got = simhash_pairs(ds, max_hamming=3, num_partitions=4).to_pandas()
    assert not got.duplicated(subset=["doc_a", "doc_b"]).any()
    sig = simhash_signatures(ds).to_pandas().sort_values("doc_id")
    s = sig["simhash"].to_numpy().astype(np.uint64)
    ids = sig["doc_id"].to_numpy()
    ham = np.unpackbits(
        (s[:, None] ^ s[None, :]).view(np.uint8).reshape(len(s), len(s), 8),
        axis=2,
    ).sum(axis=2)
    ia, ib = np.where((ham <= 3) & (ids[:, None] < ids[None, :]))
    want = {(int(ids[x]), int(ids[y])) for x, y in zip(ia, ib)}
    assert {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])} == want
    assert len(want) >= 20  # the planted near-copies actually collide


def test_ann_topk_exact(ray_session):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((200, 16))
    ids = np.arange(200)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel(), pa.float32()), 16
            ),
        }
    )
    qids = ids[:3]
    qm = m[:3]
    got = ann_topk(rd.from_arrow(t), (qids, qm), k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = (qm / np.linalg.norm(qm, axis=1, keepdims=True)) @ mn.T
    for qi in range(3):
        order = np.lexsort((ids, -sims[qi]))[:5]
        want = list(ids[order])
        sub = got[got.query_id == qi].sort_values("rank")
        assert list(sub.vec_id) == want


def test_lsh_topk_high_recall_on_self(ray_session):
    rng = np.random.default_rng(13)
    m = rng.standard_normal((300, 16))
    t = pa.table(
        {
            "vec_id": np.arange(300),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel(), pa.float32()), 16
            ),
        }
    )
    got = lsh_topk(rd.from_arrow(t), (np.arange(3), m[:3]), k=1).to_pandas()
    # each query's own vector must be retrieved (hamming 0 bucket)
    top1 = got[got["rank"] == 1]
    assert dict(zip(top1.query_id, top1.vec_id)) == {0: 0, 1: 1, 2: 2}


def test_embedding_neardup(ray_session):
    rng = np.random.default_rng(17)
    m = rng.standard_normal((100, 8))
    m[50] = m[10] + rng.standard_normal(8) * 0.01  # engineered near-dup
    t = pa.table(
        {
            "vec_id": np.arange(100),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel(), pa.float32()), 8
            ),
        }
    )
    got = embedding_neardup_pairs(rd.from_arrow(t), tau=0.99).to_pandas()
    assert (10, 50) in set(zip(got.vec_a, got.vec_b))


def test_neardup_approx_recall(ray_session):
    """Bucket-and-verify approx near-dup: on clustered data, recall ≥ 0.95
    vs the exact all-pairs result, zero false positives (verify is exact),
    and empty input is handled."""
    from p5_rdf_rdb2rdf_ray.stages.similarity import (
        embedding_neardup_pairs_approx,
    )

    rng = np.random.default_rng(29)
    centers = rng.standard_normal((6, 12)) * 4
    m = np.vstack(
        [centers[i % 6] + rng.standard_normal(12) * 0.15 for i in range(240)]
    )
    t = pa.table(
        {
            "vec_id": np.arange(240),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel(), pa.float32()), 12
            ),
        }
    )
    tau = 0.98
    mf = m.astype(np.float32).astype(np.float64)
    mn = mf / np.linalg.norm(mf, axis=1, keepdims=True)
    s = mn @ mn.T
    ia, ib = np.nonzero(np.triu(s >= tau, k=1))
    exact = set(zip(ia.tolist(), ib.tolist()))
    assert len(exact) > 50  # the fixture really is clustered
    got = embedding_neardup_pairs_approx(
        rd.from_arrow(t), tau=tau, nlist=6, nprobe=2, num_partitions=4
    ).to_pandas()
    approx = set(zip(got.vec_a, got.vec_b))
    assert approx <= exact  # exact verify ⇒ no false positives
    assert len(approx & exact) / len(exact) >= 0.95
    # empty corpus
    empty = embedding_neardup_pairs_approx(
        rd.from_arrow(t.slice(0, 0)), tau=tau, nlist=4
    ).to_pandas()
    assert len(empty) == 0


def test_asof_join_matches_bruteforce(ray_session):
    """asof_join == per-row brute force (latest right ts <= left ts per
    key); left rows with no earlier right row are dropped."""
    from p5_rdf_rdb2rdf_ray.stages.asof import asof_join

    rng = np.random.default_rng(31)
    nl, nr = 400, 150
    L = pd.DataFrame(
        {
            "lid": np.arange(nl),
            "k": rng.integers(0, 12, nl),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, nl), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    R = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 14, nr),  # keys 12/13 never match left
                "rts": pd.to_datetime(
                    rng.integers(0, 10_000, nr), unit="s"
                ).astype("datetime64[us]"),
                "payload": np.arange(nr) * 10,
            }
        )
        .sort_values("payload")
        .drop_duplicates(subset=["k", "rts"], keep="last")  # dedup ties
    )
    got = asof_join(
        rd.from_pandas(L), rd.from_pandas(R),
        key_left="k", key_right="k", ts_left="ts", ts_right="rts",
        left_cols=["lid", "ts"], right_cols=["payload", "rts"],
        num_partitions=4,
        out_dtypes={"lid": "int64", "payload": "int64"},
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # round-3 driver red row: the union-tag shuffle null-pads each side's
    # missing columns, widening int64 payloads on BOTH sides to float64;
    # out_dtypes must restore them (the driver's value hash is
    # dtype-sensitive)
    assert str(got["lid"].dtype) == "int64"
    assert str(got["payload"].dtype) == "int64"
    want_rows = []
    for r in L.itertuples():
        cand = R[(R["k"] == r.k) & (R["rts"] <= r.ts)]
        if len(cand):
            best = cand.loc[cand["rts"].idxmax()]
            want_rows.append((r.lid, r.ts, best["payload"], best["rts"]))
    want = pd.DataFrame(
        want_rows, columns=["lid", "ts", "payload", "rts"]
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["payload"].to_numpy() == want["payload"].to_numpy()).all()
    assert (got["rts"].to_numpy() == want["rts"].to_numpy()).all()


def test_grouped_aggregate_exact(ray_session):
    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, size=n).astype(str),
            "v": rng.integers(0, 100, size=n).astype(float),
        }
    )
    got = grouped_aggregate(
        rd.from_pandas(df),
        keys=["k"],
        aggs={
            "s": ("v", "sum"),
            "c": ("v", "count"),
            "mn": ("v", "min"),
            "mx": ("v", "max"),
            "avg": ("v", "mean"),
        },
        num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (
        df.groupby("k")["v"]
        .agg(s="sum", c="count", mn="min", mx="max", avg="mean")
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "s", "c", "mn", "mx", "avg"]],
        want[["k", "s", "c", "mn", "mx", "avg"]],
        check_dtype=False,
    )


def test_learn_bpe_matches_reference(ray_session):
    """merges_per_round=1 reproduces the textbook sequential BPE merge
    sequence exactly (same tie-break); batched rounds produce valid
    disjoint merges with correct frequencies."""
    from collections import Counter

    from p5_rdf_rdb2rdf_ray.stages.bpe import learn_bpe, reference_bpe

    docs = [
        "the cat sat on the mat",
        "the bat and the cat",
        "mat bat cat hat",
        "the the the hat",
    ] * 10
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3)

    got = learn_bpe(ds, num_merges=8, merges_per_round=1, min_freq=1)
    wf = Counter()
    for d in docs:
        for w in d.lower().split():
            wf[w] += 1
    assert list(zip(got["left"], got["right"])) == reference_bpe(
        dict(wf), 8
    )
    assert got["rank"].tolist() == list(range(1, 9))

    b = learn_bpe(ds, num_merges=8, merges_per_round=4, min_freq=1)
    assert len(b) == 8 and (b["freq"] > 0).all()
    # within each round's batch, chosen pairs share no symbol
    assert b.iloc[0]["left"] != b.iloc[1]["left"]

    with pytest.raises(ValueError, match=">= 1"):
        learn_bpe(ds, num_merges=0)


def test_grouped_approx_distinct(ray_session):
    """Per-group HLL: within ~5% of exact per group (p=12 → 1.6% rse),
    and BLOCK-LAYOUT INDEPENDENT — register max-merge is an exact
    monoid, so different partitionings give identical estimates."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import grouped_approx_distinct

    rng = np.random.default_rng(67)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abc"), size=n),
            "u": rng.integers(0, 5000, size=n),
        }
    )
    exact = df.groupby("g")["u"].nunique()
    got1 = (
        grouped_approx_distinct(
            rd.from_pandas(df).repartition(4), ["g"], "u", p=12
        )
        .to_pandas()
        .set_index("g")["approx_ndistinct"]
    )
    got2 = (
        grouped_approx_distinct(
            rd.from_pandas(df).repartition(13), ["g"], "u", p=12
        )
        .to_pandas()
        .set_index("g")["approx_ndistinct"]
    )
    for g in "abc":
        assert abs(got1[g] - exact[g]) / exact[g] < 0.05
        assert got1[g] == got2[g]  # layout-independent
    with pytest.raises(ValueError, match="group keys"):
        grouped_approx_distinct(rd.from_pandas(df), [], "u")


def test_grouped_count_distinct(ray_session):
    """Exact COUNT(DISTINCT) per group: matches pandas nunique across
    partitionings, NULL values don't count; approx=True delegates to
    the HLL sketch (same ±5% bound, alias renamed)."""
    from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_count_distinct

    rng = np.random.default_rng(68)
    n = 40_000
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abc"), size=n),
            "u": rng.integers(0, 3000, size=n).astype("float64"),
        }
    )
    df.loc[df.index[:500], "u"] = None  # NULLs must not count
    exact = df.groupby("g")["u"].nunique()
    for parts in (3, 11):
        got = (
            grouped_count_distinct(
                rd.from_pandas(df).repartition(parts), ["g"], "u", out="nd"
            )
            .to_pandas()
            .set_index("g")["nd"]
        )
        for g in "abc":
            assert got[g] == exact[g]
    approx = (
        grouped_count_distinct(
            rd.from_pandas(df.dropna()), ["g"], "u", out="nd",
            approx=True, p=12,
        )
        .to_pandas()
        .set_index("g")["nd"]
    )
    for g in "abc":
        assert abs(approx[g] - exact[g]) / exact[g] < 0.05
    with pytest.raises(ValueError, match="reserved"):
        grouped_count_distinct(rd.from_pandas(df), ["__g"], "u")


def test_sparql_count_distinct_text(ray_session, tmp_path):
    """COUNT(DISTINCT ?v) through the text front-end equals the exact
    per-group nunique; non-COUNT DISTINCT aggregates reject."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import parse_query

    q = parse_query(
        "SELECT ?g (COUNT(DISTINCT ?u) AS ?nd) WHERE { ?s <p:g> ?g . "
        "?s <p:u> ?u } GROUP BY ?g"
    )
    assert q.aggregates == {"nd": ("count_distinct", "u", None)}
    with pytest.raises(ValueError, match="only supported for COUNT"):
        parse_query(
            "SELECT ?g (SUM(DISTINCT ?u) AS ?x) WHERE { ?s <p:u> ?u } "
            "GROUP BY ?g"
        )
    with pytest.raises(ValueError, match="name a variable"):
        parse_query(
            "SELECT ?g (COUNT(DISTINCT *) AS ?x) WHERE { ?s <p:u> ?u } "
            "GROUP BY ?g"
        )


def test_rollup_aggregate(ray_session):
    """ROLLUP levels re-aggregate the finer level exactly (count→sum,
    sum→sum, min/max→min/max); rolled-up keys are NULL; mean rejects."""
    from p5_rdf_rdb2rdf_ray.stages.groupagg import rollup_aggregate

    rng = np.random.default_rng(61)
    n = 3000
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xyz"), size=n),
            "b": rng.choice(list("pq"), size=n),
            "v": rng.integers(0, 100, size=n),
        }
    )
    got = rollup_aggregate(
        rd.from_pandas(df).repartition(5),
        keys=["a", "b"],
        aggs={"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
        num_partitions=4,
    ).to_pandas()

    lvl2 = got[got["b"].notna()]
    lvl1 = got[got["b"].isna() & got["a"].notna()]
    lvl0 = got[got["a"].isna()]
    assert len(lvl2) == 6 and len(lvl1) == 3 and len(lvl0) == 1
    want2 = df.groupby(["a", "b"])["v"].agg(["count", "sum", "max"])
    for r in lvl2.itertuples():
        w = want2.loc[(r.a, r.b)]
        assert (r.n, r.s, r.mx) == (w["count"], w["sum"], w["max"])
    want1 = df.groupby("a")["v"].agg(["count", "sum", "max"])
    for r in lvl1.itertuples():
        w = want1.loc[r.a]
        assert (r.n, r.s, r.mx) == (w["count"], w["sum"], w["max"])
    t = lvl0.iloc[0]
    assert (t["n"], t["s"], t["mx"]) == (n, df["v"].sum(), df["v"].max())

    with pytest.raises(ValueError, match="re-aggregate"):
        rollup_aggregate(
            rd.from_pandas(df), ["a"], {"m": ("v", "mean")}
        )


def test_grouped_concat(ray_session):
    """string_agg semantics across many blocks: values join in order_by
    order within each key, NULL values skip, an all-NULL group keeps its
    row with a NULL concat, and results are block-layout independent."""
    from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_concat

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 11, size=n),
            "ord": rng.permutation(n),
            "v": pd.array(
                [
                    None if i % 17 == 0 else f"t{i % 5}"
                    for i in range(n)
                ],
                dtype="string",
            ),
        }
    )
    # one key that is ALL NULL values
    df.loc[df.k == 10, "v"] = None
    got = (
        grouped_concat(
            rd.from_pandas(df).repartition(7),
            keys=["k"],
            col="v",
            sep="|",
            order_by=["ord"],
            out="seq",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "ord"])
        .groupby("k")["v"]
        .agg(
            lambda s: "|".join(s.dropna().astype(str))
            if s.notna().any()
            else None
        )
        .rename("seq")
        .reset_index()
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["seq"].fillna("<NA>").tolist() == want["seq"].fillna(
        "<NA>"
    ).tolist()
    assert got.loc[got.k == 10, "seq"].isna().all()

    with pytest.raises(ValueError, match="reserved"):
        grouped_concat(rd.from_pandas(df), ["k"], "v", out="__x")


def test_top_k(ray_session):
    rng = np.random.default_rng(29)
    df = pd.DataFrame({"a": rng.permutation(1000), "b": np.arange(1000)})
    got = top_k(rd.from_pandas(df), ["a"], k=5, descending=True).to_pandas()
    assert sorted(got.a, reverse=True) == [999, 998, 997, 996, 995]


def test_score_sample(ray_session):
    """Per-row keep probability: rate 1 keeps all, 0 keeps none, NULL
    and out-of-range rates clamp/drop; deterministic across re-runs and
    block layouts; matches the scalar fmix32 formula row-by-row."""
    from p5_rdf_rdb2rdf_ray.stages.sample import fmix32, score_sample

    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "rate": np.where(
                np.arange(n) % 7 == 0, np.nan, (np.arange(n) % 11) / 10.0
            ),
        }
    )
    df.loc[0, "rate"] = 2.5  # clamps to 1.0
    df.loc[1, "rate"] = -3.0  # clamps to 0.0
    got = (
        score_sample(rd.from_pandas(df).repartition(5), "rate", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    rate = np.clip(np.nan_to_num(df["rate"].to_numpy(), nan=0.0), 0, 1)
    thr = np.floor(rate * 1_000_000.0).astype(np.uint64)
    keep = fmix32(df["doc_id"].to_numpy()) % np.uint64(1_000_000) < thr
    assert got["doc_id"].tolist() == df.loc[keep, "doc_id"].tolist()
    # rate-1.0 rows always kept, rate-0/NULL rows never
    assert 0 in set(got["doc_id"]) or rate[0] != 1.0
    ones = df.index[(rate == 1.0)]
    assert set(ones) <= set(got["doc_id"])
    zeros = df.index[(thr == 0)]
    assert not (set(zeros) & set(got["doc_id"]))


def test_pagerank_power_iteration(ray_session):
    """Distributed PageRank equals a numpy power-iteration reference
    (dangling redistribution + teleport) to 1e-9 on a random digraph;
    rank mass stays exactly 1; deep iteration counts survive (the
    stats-lineage RecursionError guard); bad params raise."""
    from p5_rdf_rdb2rdf_ray.stages.pagerank import pagerank

    rng = np.random.default_rng(53)
    n = 60
    edges = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(400, 2))}
    edges = sorted((a, b) for a, b in edges if a != b)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(5)
    iters, d = 10, 0.85
    got = (
        pagerank(ds, damping=d, iters=iters, num_partitions=4)
        .to_pandas()
        .sort_values("node")
    )

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    M = np.zeros((m, m))
    outd = np.zeros(m)
    for a, _b in edges:
        outd[idx[a]] += 1
    for a, b in edges:
        M[idx[b], idx[a]] = 1.0 / outd[idx[a]]
    r = np.full(m, 1.0 / m)
    dang_mask = outd == 0
    for _ in range(iters):
        dang = r[dang_mask].sum()
        r = (1 - d) / m + d * (M @ r + dang / m)

    assert got["node"].tolist() == nodes
    assert np.abs(got["rank"].to_numpy() - r).max() < 1e-9
    assert abs(got["rank"].sum() - 1.0) < 1e-12

    with pytest.raises(ValueError, match="damping"):
        pagerank(ds, damping=1.5)
    with pytest.raises(ValueError, match="positive"):
        pagerank(ds, iters=0)


def test_redact_text(ray_session):
    """Patterns apply IN ORDER (earlier replacements visible to later
    patterns), NULLs pass through, out_col leaves the source intact."""
    from p5_rdf_rdb2rdf_ray.stages.textstats import redact_text

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail a.b+c@ex-1.org or 12345678 now",
                None,
                "id 9999999x and short 123",
            ],
        }
    )
    out = (
        redact_text(
            rd.from_pandas(df),
            patterns=[
                (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
                (r"[0-9]{7,}", "<NUM>"),
            ],
            out_col="clean",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["clean"].tolist()[0] == "mail <EMAIL> or <NUM> now"
    assert pd.isna(out["clean"].tolist()[1])
    assert out["clean"].tolist()[2] == "id <NUM>x and short 123"
    assert out["text"].tolist()[0].startswith("mail a.b+c@")  # source kept
    # order matters: a number-first pass would eat the digits inside the
    # email's local part before the email pattern sees them
    swapped = redact_text(
        rd.from_pandas(pd.DataFrame({"text": ["x 12345678@ex.org"]})),
        patterns=[(r"[0-9]{7,}", "<NUM>"),
                  (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<E>")],
    ).to_pandas()
    # digits ate the local part, so the email pattern can no longer match
    assert swapped["text"].tolist() == ["x <NUM>@ex.org"]


def test_profile_columns(ray_session):
    """One streaming pass, partial-per-block merge: exact count/nulls/
    min/max across block layouts; timestamps profile as epoch µs;
    all-null columns give NaN bounds; strings fail loud."""
    from p5_rdf_rdb2rdf_ray.stages.profile import profile_columns

    df = pd.DataFrame(
        {
            "a": [1, 2, None, 4, 5],
            "b": [0.5, None, None, -3.25, 10.0],
            "t": pd.to_datetime(
                ["2024-01-01", None, "2024-06-01", "2023-12-31", "2024-03-01"]
            ).astype("datetime64[us]"),
            "allnull": pd.array([None] * 5, dtype="Int64"),
            "s": list("abcde"),
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = profile_columns(ds, ["a", "b", "t", "allnull"]).set_index("column")
    assert out.loc["a", "n"] == 5 and out.loc["a", "nulls"] == 1
    assert out.loc["a", "min_v"] == 1.0 and out.loc["a", "max_v"] == 5.0
    assert out.loc["b", "min_v"] == -3.25 and out.loc["b", "max_v"] == 10.0
    assert out.loc["allnull", "nulls"] == 5
    assert np.isnan(out.loc["allnull", "min_v"])
    assert out.loc["t", "min_v"] == pd.Timestamp("2023-12-31").value / 1e3
    with pytest.raises(Exception, match="non-numeric"):
        profile_columns(ds, ["s"])

    # nanosecond timestamps with sub-µs components TRUNCATE to epoch µs
    # (a safe timestamp[us] cast would raise "would lose data"); date32
    # scales from days
    t2 = pa.table(
        {
            "tn": pa.array([1001, 2_000_001], pa.timestamp("ns")),
            "d": pa.array([19723, 19724], pa.date32()),
        }
    )
    out2 = profile_columns(rd.from_arrow(t2)).set_index("column")
    assert out2.loc["tn", "min_v"] == 1.0  # 1001 ns -> 1 µs
    assert out2.loc["tn", "max_v"] == 2000.0
    assert out2.loc["d", "min_v"] == 19723 * 86_400_000_000.0


def test_window_shift_lag_lead(ray_session):
    """LAG/LEAD per key partition: matches pandas groupby.shift on the
    totally-ordered frame, integer sources stay nullable integer (no
    silent float widening), block layout independent."""
    from p5_rdf_rdb2rdf_ray.stages.sessions import window_shift

    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, size=n),
            "o": rng.permutation(n),
            "v": rng.integers(0, 1000, size=n),
        }
    )
    got = (
        window_shift(
            rd.from_pandas(df).repartition(5),
            keys=["k"],
            order_by=["o"],
            shifts={"prev_v": ("v", 1), "next_v": ("v", -1)},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = want.groupby("k", sort=False)
    want["prev_v"] = g["v"].shift(1).astype("Int64")
    want["next_v"] = g["v"].shift(-1).astype("Int64")
    for c in ("prev_v", "next_v"):
        assert (
            got[c].astype("Int64").fillna(-1).tolist()
            == want[c].fillna(-1).tolist()
        )
    with pytest.raises(ValueError, match="non-zero"):
        window_shift(rd.from_pandas(df), ["k"], ["o"], {"x": ("v", 0)})
    # overwriting a source column in place would feed already-shifted
    # values to the next shift — must fail loud
    with pytest.raises(ValueError, match="collides"):
        window_shift(
            rd.from_pandas(df), ["k"], ["o"],
            {"v": ("v", 1), "w": ("v", -1)},
        )


def test_grouped_quantiles(ray_session):
    """Per-group exact discrete quantiles match the global pick rule
    applied group-wise (ceil(q·n)−1 over sorted values, nulls ignored)."""
    import math

    from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_quantiles

    rng = np.random.default_rng(43)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 6, size=n),
            "x": rng.normal(size=n).round(3),
        }
    )
    df.loc[df.sample(frac=0.05, random_state=1).index, "x"] = np.nan
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = (
        grouped_quantiles(
            rd.from_pandas(df).repartition(7), ["g"], "x", qs,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )

    def ref(grp):
        vals = np.sort(grp["x"].dropna().to_numpy())
        return [
            (q, vals[max(0, math.ceil(q * len(vals)) - 1)]) for q in qs
        ]

    want = []
    for gk, grp in df.groupby("g"):
        want += [(gk, q, v) for q, v in ref(grp)]
    want = pd.DataFrame(want, columns=["g", "q", "value"]).sort_values(
        ["g", "q"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kmeans_blobs(ray_session):
    """Distributed Lloyd's recovers well-separated blobs exactly (each
    true blob maps to exactly one cluster, purity 1.0), euclidean mode
    included; assignment under fixed centroids is block-layout
    independent; balanced sampling is deterministic and ≈target."""
    from p5_rdf_rdb2rdf_ray.stages.cluster import (
        cluster_balanced_sample,
        cluster_sizes,
        kmeans_assign,
        kmeans_fit,
    )

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    pts = np.vstack(
        [c + rng.normal(0, 0.5, size=(400, 3)) for c in centers]
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.astype(np.float32).ravel(), pa.float32()), 3
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    truth = np.repeat([0, 1, 2], 400)

    for spherical in (True, False):
        c = kmeans_fit(ds, k=3, iters=8, seed=1, spherical=spherical)
        assert c.shape == (3, 3)
        a = (
            kmeans_assign(ds, c, score_col="sim", spherical=spherical)
            .to_pandas()
            .sort_values("vec_id")
        )
        cross = pd.crosstab(truth, a["cluster"].to_numpy()).to_numpy()
        assert (cross > 0).sum() == 3  # one cluster per blob: purity 1.0
        assert set(cross[cross > 0]) == {400}

    # fixed-centroid assignment is block-layout independent
    c = kmeans_fit(ds, k=3, iters=8, seed=1)
    a1 = kmeans_assign(ds, c, drop_vec=True).to_pandas().sort_values("vec_id")
    a2 = (
        kmeans_assign(rd.from_arrow(t).repartition(13), c, drop_vec=True)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert a1["cluster"].tolist() == a2["cluster"].tolist()
    assert "embedding" not in a1.columns

    sz = cluster_sizes(rd.from_arrow(pa.table({"cluster": a1["cluster"]})))
    assert sorted(sz.to_pandas()["n"]) == [400, 400, 400]

    # balanced sample: deterministic, ~target per cluster, subset rows
    s1 = (
        cluster_balanced_sample(ds, c, target_per_cluster=100, key_col="vec_id")
        .to_pandas()
        .sort_values("vec_id")
    )
    s2 = (
        cluster_balanced_sample(ds, c, target_per_cluster=100, key_col="vec_id")
        .to_pandas()
        .sort_values("vec_id")
    )
    assert s1["vec_id"].tolist() == s2["vec_id"].tolist()
    per = s1.groupby("cluster").size()
    assert len(per) == 3 and ((per > 60) & (per < 140)).all()
    # a small cluster (< target) passes through whole
    full = cluster_balanced_sample(
        ds, c, target_per_cluster=10_000, key_col="vec_id"
    ).to_pandas()
    assert len(full) == len(pts)

    with pytest.raises(ValueError, match="positive"):
        kmeans_fit(ds, k=0)


def test_multimodal_features_deterministic(ray_session):
    media = synth_media_table(30)
    f1 = extract_features(rd.from_arrow(media), batch_size=8).to_pandas()
    f2 = extract_features(rd.from_arrow(media), batch_size=16).to_pandas()
    assert len(f1) == 30
    m1 = {r.media_id: list(r.feature) for r in f1.itertuples()}
    m2 = {r.media_id: list(r.feature) for r in f2.itertuples()}
    assert m1 == m2  # batch-size independent, retry-reproducible


def test_probe_image_header_parses_real_containers(ray_session):
    """The dependency-free header probe is a REAL byte-level decode:
    PNG IHDR (big-endian), GIF screen descriptor (little-endian), JPEG
    SOF behind leading APPn segments; garbage/truncated payloads come
    back (None, -1, -1) instead of a guess."""
    from p5_rdf_rdb2rdf_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        probe_headers,
        probe_image_header,
        synth_image_payload,
    )

    cases = [("png", 640, 480), ("jpeg", 31, 17), ("gif", 1, 65535)]
    for fmt, w, h in cases:
        assert probe_image_header(synth_image_payload(fmt, w, h)) == (fmt, w, h)
    assert probe_image_header(b"") == (None, -1, -1)
    assert probe_image_header(b"\x89PNG\r\n\x1a\n1234") == (None, -1, -1)
    assert probe_image_header(b"\xff\xd8\xff\xd9") == (None, -1, -1)
    # ITU T.81 B.1.1.2: 0xFF fill bytes may pad any marker — a JPEG with
    # padding before its SOF must still parse (round-4 review find)
    padded = synth_image_payload("jpeg", 31, 17).replace(
        b"\xff\xc0", b"\xff\xff\xff\xc0", 1
    )
    assert probe_image_header(padded) == ("jpeg", 31, 17)
    # through the Dataset stage
    n = 9
    media = pa.Table.from_pydict(
        {
            "media_id": list(range(n)),
            "kind": ["image"] * n,
            "payload": [
                synth_image_payload(("png", "jpeg", "gif")[i % 3], i + 1, i + 2)
                for i in range(n)
            ],
            "mime": ["image/x"] * n,
            "width": [-1] * n,
            "height": [-1] * n,
            "duration_ms": [0] * n,
        },
        schema=MEDIA_SCHEMA,
    )
    got = probe_headers(rd.from_arrow(media)).to_pandas().sort_values(
        "media_id"
    )
    assert list(got["width"]) == [i + 1 for i in range(n)]
    assert list(got["height"]) == [i + 2 for i in range(n)]
    assert list(got["fmt"]) == [("png", "jpeg", "gif")[i % 3] for i in range(n)]


def test_multimodal_real_decoder_contract():
    """Decoder-hook contract without Ray: forcing the real decoder raises
    cleanly when PIL is absent; auto mode falls back to the deterministic
    fake for undecodable payloads either way."""
    import pytest as _pytest

    from p5_rdf_rdb2rdf_ray.stages.multimodal import (
        MediaFeatureExtractor,
        _fake_decode,
        _try_pil,
    )

    if _try_pil() is None:
        with _pytest.raises(NotImplementedError):
            MediaFeatureExtractor(use_real_decoder=True)
    ex = MediaFeatureExtractor(out_dim=16)  # auto
    junk = b"\x00\x01not-an-image"
    assert np.array_equal(ex._decode(junk, "image"), _fake_decode(junk, 16))


def test_multimodal_real_decoder_pil():
    """Real-PIL path (skipped in containers without Pillow): a true PNG
    decodes to pixel features, and the resizer emits a PNG of the target
    size."""
    import io

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from p5_rdf_rdb2rdf_ray.stages.multimodal import (
        ImageResizer,
        MediaFeatureExtractor,
        _fake_decode,
    )

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), (120, 30, 200)).save(buf, format="PNG")
    png = buf.getvalue()
    ex = MediaFeatureExtractor(out_dim=16, use_real_decoder=True)
    feat = ex._decode(png, "image")
    assert len(feat) == 16
    assert not np.array_equal(feat, _fake_decode(png, 16))
    rz = ImageResizer(out_w=8, out_h=6, use_real_decoder=True)
    out = Image.open(io.BytesIO(rz._resize(png)))
    assert out.size == (8, 6)


def test_multimodal_frame_sampler(ray_session):
    media = synth_media_table(30)
    frames = sample_frames(rd.from_arrow(media), num_frames=4).to_pandas()
    n_videos = sum(1 for k in media.column("kind").to_pylist() if k == "video")
    assert len(frames) == n_videos * 4
    assert set(frames.frame_idx) == {0, 1, 2, 3}


def test_token_counts(ray_session):
    t = pa.table({"doc_id": [1, 2], "text": ["a b  c", "hello, world!"]})
    got = token_counts(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_tokens"] == 3
    assert got.loc[2, "n_tokens"] == 2
    assert got.loc[2, "n_bpe_tokens"] == 4  # hello , world !


def test_connected_components_distributed(ray_session):
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.cc import cc_labels_small, connected_components

    rng = np.random.default_rng(31)
    # 3 chains + singleton pairs + one hub (hot key)
    edges = []
    for c in range(3):
        for i in range(30):
            edges.append((f"n{c}_{i}", f"n{c}_{i+1}"))
    hub = "hub"
    for i in range(50):
        edges.append((hub, f"spoke_{i}"))
    t = pa.table({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    got = connected_components(
        rd.from_arrow(t), max_rounds=40, num_partitions=4
    ).to_pandas()
    want = cc_labels_small(edges)
    gm = dict(zip(got.node, got.label))
    assert gm == want


def test_first_per_group(ray_session):
    from p5_rdf_rdb2rdf_ray.engine.distinct import first_per_group

    rng = np.random.default_rng(37)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, size=2000),
            "o": rng.permutation(2000),
            "v": np.arange(2000),
        }
    )
    got = (
        first_per_group(rd.from_pandas(df), ["k"], "o", num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values("o", kind="mergesort")
        .drop_duplicates(subset=["k"], keep="first")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "o", "v"]], want[["k", "o", "v"]], check_dtype=False)


def test_multimodal_resize(ray_session):
    from p5_rdf_rdb2rdf_ray.stages.multimodal import resize_images, synth_media_table

    media = synth_media_table(12)
    out = resize_images(rd.from_arrow(media), out_w=8, out_h=8).to_pandas()
    imgs = out[out.kind == "image"]
    others = out[out.kind != "image"]
    assert (imgs.width == 8).all() and (imgs.height == 8).all()
    assert imgs.payload.map(len).eq(64).all()
    assert (others.width == 64).all()  # untouched


def test_shuffle_partition_invariant(ray_session):
    """EXACTNESS INVARIANT for every per-key stage (distinct, grouped
    aggregate, first_per_group, sessionize, pair expansion, semi-joins):
    the hash-shuffle operator emits exactly ONE block per partition even
    when a partition far exceeds target_max_block_size, so the FIRST map
    after a key-repartition sees whole partitions. If a Ray upgrade breaks
    this, every such stage needs a re-merge guard — this test is the alarm."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.distinct import ensure_hash_shuffle

    n = 1_200_000  # one hot key, ~180 MB > 128 MB default block target
    t = pa.table(
        {"k": pa.array(np.zeros(n, np.int64)), "v": pa.array(["y" * 150] * n)}
    )
    ds = rd.from_arrow(t)
    ensure_hash_shuffle(ds)
    rep = ds.repartition(2, keys=["k"])
    counts = rep.map_batches(
        lambda b: pa.table({"rows": [b.num_rows]}),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    nonempty = [c["rows"] for c in counts if c["rows"]]
    assert nonempty == [n], f"partition was split across blocks: {counts}"


def test_keyed_exact_fallback(ray_session, monkeypatch):
    """The re-merge guard behind every per-key stage: with
    P5_KEYED_ONE_BLOCK=0 `keyed_exact` routes through
    groupby().map_groups (correct under ANY reducer block layout) and
    the window/session/aggregate stages produce IDENTICAL output to the
    pinned one-block fast path — a future Ray that splits reducer
    partitions degrades to slow-but-correct, never silently wrong."""
    import numpy as np

    from p5_rdf_rdb2rdf_ray.engine.distinct import one_block_invariant
    from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_aggregate
    from p5_rdf_rdb2rdf_ray.stages.sessions import window_shift
    from p5_rdf_rdb2rdf_ray.stages.windows import rolling_aggregate

    rng = np.random.default_rng(77)
    n = 5_000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, n),
            "ts": rng.permutation(n).astype("int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )

    def run():
        roll = (
            rolling_aggregate(
                rd.from_pandas(df).repartition(5), ["u"], ["ts"],
                {"s3": ("v", "sum", 3)}, num_partitions=4,
            )
            .to_pandas()
            .sort_values(["u", "ts"])
            .reset_index(drop=True)
        )
        shift = (
            window_shift(
                rd.from_pandas(df).repartition(5), ["u"], ["ts"],
                {"prev": ("v", 1)}, num_partitions=4,
            )
            .to_pandas()
            .sort_values(["u", "ts"])
            .reset_index(drop=True)
        )
        agg = (
            grouped_aggregate(
                rd.from_pandas(df).repartition(5), ["u"],
                {"tot": ("v", "sum"), "m": ("v", "mean")}, num_partitions=4,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        return roll, shift, agg

    assert one_block_invariant()  # pinned Ray → fast path by default
    fast = run()
    monkeypatch.setenv("P5_KEYED_ONE_BLOCK", "0")
    assert not one_block_invariant()
    slow = run()
    for f, s in zip(fast, slow):
        pd.testing.assert_frame_equal(
            f, s[f.columns], check_like=False
        )


def test_language_id(ray_session):
    """LanguageID actor stage: en/fr/es/de stopword profiles + CJK range."""
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.textstats import language_id

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "the cat sat on the mat and it is that good for you",
                "le chat est dans la maison et il est pour vous",
                "el gato es un animal y la casa es de madera",
                "der hund ist ein tier und das haus ist nicht klein",
                "这是一个中文句子",
                "",  # no signal → deterministic first-alphabetical tie
            ],
        }
    )
    out = {
        r["doc_id"]: r["pred_lang"]
        for r in language_id(rd.from_arrow(docs)).take_all()
    }
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "zh"
    assert out[5] == "de"


def test_shingle_skew_telemetry_and_max_df(ray_session):
    """One shingle shared by EVERY doc (hot-key skew fixture): telemetry
    reports max_df == n_docs; exact jaccard still correct with the hot
    shingle; max_df cap drops it (changed metric, documented)."""
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.dedup import (
        ngram_jaccard_pairs,
        shingle_df_stats,
    )

    n_docs = 30
    rows = []
    for i in range(n_docs):
        # every doc starts with the same 3-gram; docs 0/1 are near-dups
        body = "alpha beta gamma " + (
            "x y z w v u" if i < 2 else f"uniq{i} uu{i} vv{i} ww{i} xx{i} yy{i}"
        )
        rows.append({"doc_id": i, "text": body})
    ds = rd.from_items(rows)
    stats = shingle_df_stats(ds)
    assert stats["max_df"] == n_docs  # the hot shingle is visible
    pairs = ngram_jaccard_pairs(ds, tau=0.5).take_all()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {(0, 1)}
    # capping df excludes the hot shingle from the metric entirely
    pairs_capped = ngram_jaccard_pairs(ds, tau=0.5, max_df=5).take_all()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs_capped} == {(0, 1)}


def test_connected_components_high_diameter(ray_session, caplog):
    """A 120-node path (diameter 120 >> 12 rounds): plain min-label
    propagation cannot converge in 12 rounds (and must WARN); pointer
    jumping converges (~log2(120) ≈ 7 rounds) and labels the whole path
    with node 0."""
    import logging

    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.cc import connected_components

    edges = rd.from_items(
        [{"src": f"n{i:04d}", "dst": f"n{i + 1:04d}"} for i in range(120)]
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges, num_partitions=4).take_all()
    }
    assert len(labels) == 121
    assert set(labels.values()) == {"n0000"}

    with caplog.at_level(logging.WARNING):
        connected_components(
            edges, num_partitions=4, shortcut=False, max_rounds=4
        ).take_all()
    assert any("no fixpoint" in r.message for r in caplog.records)


def test_ivf_topk_recall(ray_session):
    """IVF vs brute force on clustered vectors: full-probe (nprobe=nlist)
    is EXACT; partial probe keeps high recall on clustered data."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.similarity import ann_topk, ivf_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 4
    m = np.vstack([c + rng.standard_normal((250, 32)) for c in centers])
    ids = np.arange(len(m), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel()), 32
            ).cast(pa.list_(pa.float64())),
        }
    )
    qs = (ids[:4], m[:4])
    ds = rd.from_arrow(t)

    def ranks(res):
        return {
            (r["query_id"], r["rank"]): r["vec_id"] for r in res.take_all()
        }

    exact = ranks(ann_topk(rd.from_arrow(t), qs, k=10))
    full = ranks(
        ivf_topk(rd.from_arrow(t), qs, k=10, nlist=8, nprobe=8)
    )
    assert full == exact  # full probe == brute force
    part = ivf_topk(ds, qs, k=10, nlist=8, nprobe=2)
    got = {(r["query_id"], r["vec_id"]) for r in part.take_all()}
    want = {(q, v) for (q, _rk), v in exact.items()}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall


def test_tumbling_window(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.sessions import tumbling_window

    ts = pd.to_datetime(
        ["2026-01-01 00:10", "2026-01-01 00:50", "2026-01-01 01:10",
         "2026-01-01 00:20", "2026-01-01 02:59"]
    )
    df = pd.DataFrame(
        {"user_id": [1, 1, 1, 2, 2], "ts": ts, "value": [1.0, 2.0, 4.0, 8.0, 16.0]}
    )
    got = (
        tumbling_window(rd.from_pandas(df), window_s=3600, num_partitions=2)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert got.n_events.tolist() == [2, 1, 1, 1]
    assert got.sum_value.tolist() == [3.0, 4.0, 8.0, 16.0]
    assert got.window_start.dt.hour.tolist() == [0, 1, 0, 2]


def test_semi_join_union_tag(ray_session):
    """_semi_join (union-tag, one shuffle): the scale fallback for
    candidate filtering when broadcasts would be too large — exercises
    the empty-right-partition case that crashes Ray's Dataset.join."""
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.dedup import _semi_join

    left = rd.from_items(
        [{"a": i, "b": i % 3, "payload": i * 10} for i in range(30)]
    )
    right = rd.from_items([{"a": 3, "b": 0}, {"a": 7, "b": 1}, {"a": 7, "b": 1}])
    got = _semi_join(
        left, right, ["a", "b"], {"payload": pa.int64()}, num_partitions=8
    ).take_all()
    assert sorted((r["a"], r["payload"]) for r in got) == [(3, 30), (7, 70)]


def test_clean_corpus_verdicts(ray_session):
    """Composed cleaning pipeline: every verdict branch fires, one row
    per input doc, and the stages apply in order (quality/language drops
    never participate in dedup; near-dedup runs on exact winners)."""
    from p5_rdf_rdb2rdf_ray.pipelines.clean import clean_corpus

    en = (
        "the cat and the dog ran to the house of the baker "
        "with a basket full of bread for the market in town"
    )
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [
                en,                      # kept (rep of 2 and 3)
                en,                      # exact_dup → rep 1
                en + " extra tail here",  # near_dup → rep 1
                "too short",             # quality (< 5 words)
                "der hund und die katze ist nicht mit der maus "
                "und das haus ist ein gutes haus mit der tür",  # language
                "entirely different words about rockets planets "
                "and the galaxies of the night sky above it",   # kept
            ],
        }
    )
    got = (
        clean_corpus(
            rd.from_arrow(t), langs=("en",), neardup_tau=0.5,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == 6
    assert got.loc[1, "status"] == "kept" and got.loc[1, "rep_id"] == 1
    assert got.loc[2, "status"] == "exact_dup" and got.loc[2, "rep_id"] == 1
    assert got.loc[3, "status"] == "near_dup" and got.loc[3, "rep_id"] == 1
    assert got.loc[4, "status"] == "quality" and pd.isna(got.loc[4, "rep_id"])
    assert got.loc[5, "status"] == "language" and pd.isna(got.loc[5, "rep_id"])
    assert got.loc[6, "status"] == "kept" and got.loc[6, "rep_id"] == 6


def test_clean_corpus_scratch_dir(ray_session, tmp_path):
    """scratch_dir spill path: same verdicts, flags computed once and
    re-read from partitioned parquet by the three consumers."""
    from p5_rdf_rdb2rdf_ray.pipelines.clean import clean_corpus

    t = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": ["same text repeated here five words plus"] * 2
            + ["another doc entirely with many different words inside"],
        }
    )
    got = (
        clean_corpus(
            rd.from_arrow(t), num_partitions=2,
            scratch_dir=str(tmp_path / "flags"),
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[10, "status"] == "kept"
    assert got.loc[11, "status"] == "exact_dup" and got.loc[11, "rep_id"] == 10
    assert got.loc[12, "status"] == "kept"


def test_hash_sample_deterministic_and_unbiased(ray_session):
    """Same input → identical sample across runs; rate lands near the
    target on a large key range; disjoint seeds decorrelate."""
    from p5_rdf_rdb2rdf_ray.stages.sample import fmix32, hash_sample

    n = 50_000
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
    a = hash_sample(rd.from_arrow(t), 0.3, seed=1).to_pandas()
    b = hash_sample(rd.from_arrow(t), 0.3, seed=1).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert abs(len(a) / n - 0.3) < 0.01
    # nested property: a 0.1 sample is a subset of the 0.3 sample
    c = hash_sample(rd.from_arrow(t), 0.1, seed=1).to_pandas()
    assert set(c["doc_id"]).issubset(set(a["doc_id"]))
    # different seed → a different (roughly independent) subset
    d = hash_sample(rd.from_arrow(t), 0.3, seed=2).to_pandas()
    overlap = len(set(a["doc_id"]) & set(d["doc_id"])) / n
    assert abs(overlap - 0.09) < 0.01  # P(both) = 0.3 * 0.3
    # hash quality: 32-bit outputs spread over the full range
    h = fmix32(np.arange(n), 1)
    assert h.max() > 2**31 and len(np.unique(h)) == n
    # negative keys must fail LOUDLY: the numpy uint64 fold wraps them
    # while the bit-exact SQL oracle operates on signed values, so a
    # negative-id corpus would silently disagree with the oracle
    with pytest.raises(ValueError, match="non-negative"):
        fmix32(np.array([-1, 3], np.int64), 0)
    # through the Dataset the worker's ValueError arrives wrapped in
    # RayTaskError — match on the message, not the type
    with pytest.raises(Exception, match="non-negative"):
        neg = pa.table({"doc_id": pa.array([-5, 7], pa.int64())})
        hash_sample(rd.from_arrow(neg), 0.5).to_pandas()


def test_stratified_sample_rates(ray_session):
    from p5_rdf_rdb2rdf_ray.stages.sample import stratified_sample

    n = 30_000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(["en", "de", "fr"] * (n // 3)),
        }
    )
    got = stratified_sample(
        rd.from_arrow(t), {"en": 0.6, "de": 0.05}, group_col="lang",
        default_rate=0.2, seed=3,
    ).to_pandas()
    frac = got["lang"].value_counts() / (n // 3)
    assert abs(frac["en"] - 0.6) < 0.02
    assert abs(frac["de"] - 0.05) < 0.02
    assert abs(frac["fr"] - 0.2) < 0.02


def test_mix_corpora_weights(ray_session):
    from p5_rdf_rdb2rdf_ray.stages.sample import mix_corpora

    n = 20_000
    a = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "src": pa.array(["a"] * n),
        }
    )
    b = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "src": pa.array(["b"] * n),
        }
    )
    got = mix_corpora(
        [(rd.from_arrow(a), 0.5), (rd.from_arrow(b), 0.1)], seed=0
    ).to_pandas()
    counts = got["src"].value_counts()
    assert abs(counts["a"] / n - 0.5) < 0.02
    assert abs(counts["b"] / n - 0.1) < 0.02


def test_decontaminate_docs_modes_agree(ray_session):
    """Broadcast ref-set mode and distributed semi-join mode flag the
    same docs with the same hit counts; hits = # DISTINCT corpus-doc
    shingles present anywhere in the ref set."""
    from p5_rdf_rdb2rdf_ray.stages.dedup import decontaminate_docs

    ref_text = "alpha beta gamma delta epsilon zeta"
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                # shares 4 distinct trigram shingles with ref_text
                "alpha beta gamma delta epsilon zeta eta",
                # shares zero shingles
                "one two three four five six seven",
                # repeats a shared shingle — still counts ONCE (distinct)
                "alpha beta gamma then alpha beta gamma",
            ],
        }
    )
    ref = pa.table(
        {"doc_id": pa.array([100], pa.int64()), "text": [ref_text]}
    )
    outs = {}
    for bc in (True, False):
        outs[bc] = (
            decontaminate_docs(
                rd.from_arrow(corpus), rd.from_arrow(ref),
                n=3, min_hits=2, broadcast=bc, num_partitions=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    got = outs[True]
    assert got.equals(outs[False])
    assert got["doc_id"].dtype == "int64"  # semi-join must not widen ids
    assert got.set_index("doc_id")["n_hits"].to_dict() == {1: 4, 2: 0, 3: 1}
    assert got.set_index("doc_id")["is_clean"].to_dict() == {
        1: False, 2: True, 3: True,
    }


def test_embedding_near_dedup_components(ray_session):
    """Vector twin of near_dedup_docs: a transitive cosine chain
    collapses to one component with the min vec_id as representative."""
    from p5_rdf_rdb2rdf_ray.stages.similarity import embedding_near_dedup

    # unit vectors in the plane: 0° ~ 20° ~ 40° chain at tau=cos(25°),
    # 0°~40° NOT a pair (cos 40° < tau); 90° is a singleton
    def v(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r))]

    t = pa.table(
        {
            "vec_id": pa.array([5, 9, 2, 7], pa.int64()),
            "embedding": [v(0), v(20), v(40), v(90)],
        }
    )
    tau = float(np.cos(np.deg2rad(25)))
    got = (
        embedding_near_dedup(rd.from_arrow(t), tau=tau, method="exact")
        .to_pandas()
        .set_index("vec_id")
    )
    assert got.loc[5, "rep_id"] == 2 and not got.loc[5, "is_kept"]
    assert got.loc[9, "rep_id"] == 2 and not got.loc[9, "is_kept"]
    assert got.loc[2, "rep_id"] == 2 and got.loc[2, "is_kept"]
    assert got.loc[7, "rep_id"] == 7 and got.loc[7, "is_kept"]


def test_repetition_stats(ray_session):
    from p5_rdf_rdb2rdf_ray.stages.textstats import repetition_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "spam spam spam spam ham",      # top bigram 'spam spam' 3/4
                "a\nb\na\nc",                   # 4 lines, 3 distinct
                "all words here are distinct",  # no repetition
                "solo",                         # < 2 tokens → frac 0
            ],
        }
    )
    got = (
        repetition_stats(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    )
    assert got.loc[1, "top_bigram_frac"] == 0.75
    assert got.loc[1, "n_lines"] == 1 and got.loc[1, "dup_line_frac"] == 0.0
    assert got.loc[2, "n_lines"] == 4 and got.loc[2, "dup_line_frac"] == 0.25
    assert got.loc[3, "top_bigram_frac"] == 0.25
    assert got.loc[4, "top_bigram_frac"] == 0.0


def test_grouped_top_k(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.groupagg import grouped_top_k

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 2, 2, 3],
            "v": [5, 9, 7, 9, 1, 2, 4],
            "id": [10, 11, 12, 13, 20, 21, 30],
        }
    )
    got = (
        grouped_top_k(
            rd.from_pandas(df).repartition(3),
            keys=["g"], sort_cols=["v", "id"], k=2,
            descending=[True, False], num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # g=1: the two v=9 rows (id tie-break ascending); g=2: both; g=3: one
    assert list(map(tuple, got[["g", "v", "id"]].to_numpy())) == [
        (1, 9, 11), (1, 9, 13), (2, 2, 21), (2, 1, 20), (3, 4, 30)
    ]


def test_ngram_counts_and_chunk(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.vocab import chunk_docs, ngram_counts

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the cat the cat", "The CAT", ""],  # lowercased grams
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    uni = ngram_counts(ds, n=1).to_pandas().set_index("ngram")["count"]
    assert uni.to_dict() == {"the": 3, "cat": 3}
    bi = ngram_counts(ds, n=2).to_pandas().set_index("ngram")["count"]
    # bigrams never cross documents
    assert bi.to_dict() == {"the cat": 3, "cat the": 1}
    ch = (
        chunk_docs(ds, chunk_tokens=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # case preserved, zero-token doc yields no chunks
    assert list(map(tuple, ch.to_numpy())) == [
        (1, 0, "the cat the", 3), (1, 1, "cat", 1), (2, 0, "The CAT", 2)
    ]


def test_tfidf_top_terms(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.vocab import tfidf_top_terms

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat on the mat",
                "the dog SAT",
                "",
                "cat cat cat dog",
            ],
        }
    )
    got = (
        tfidf_top_terms(rd.from_pandas(docs).repartition(3), n_docs=4, k=2)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    # doc1: mat/on score 4.0 beat the(2.0)/cat(2.0)/sat(2.0);
    # doc4: cat tf3*(4/2)=6, dog 1*(4/2)=2
    assert list(map(tuple, got[["doc_id", "term", "tfidf"]].to_numpy())) == [
        (1, "mat", 4.0), (1, "on", 4.0),
        (2, "dog", 2.0), (2, "sat", 2.0),
        (4, "cat", 6.0), (4, "dog", 2.0),
    ]


def test_hopping_window(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.sessions import hopping_window

    ts = pd.to_datetime(["2026-01-01 00:40", "2026-01-01 01:10"])
    df = pd.DataFrame({"user_id": [1, 1], "ts": ts, "value": [1.0, 2.0]})
    got = (
        hopping_window(
            rd.from_pandas(df), window_s=3600, hop_s=1800, num_partitions=2
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # windows (size 1h, hop 30m): 00:00[e1] 00:30[e1,e2] 01:00[e2]
    assert got.window_start.dt.strftime("%H:%M").tolist() == [
        "00:00", "00:30", "01:00"
    ]
    assert got.n_events.tolist() == [1, 2, 1]
    assert got.sum_value.tolist() == [1.0, 3.0, 2.0]


def test_except_intersect_graph_diff(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.distinct import except_rows, intersect_rows

    a = rd.from_pandas(
        pd.DataFrame({"x": [1, 1, 2, 3], "y": ["a", "a", "b", "c"]})
    ).repartition(2)
    b = rd.from_pandas(pd.DataFrame({"x": [2, 9], "y": ["b", "z"]}))
    exc = except_rows(a, b, ["x", "y"], num_buckets=4).to_pandas()
    assert sorted(map(tuple, exc.to_numpy())) == [(1, "a"), (3, "c")]
    inter = intersect_rows(a, b, ["x", "y"], num_buckets=4).to_pandas()
    assert sorted(map(tuple, inter.to_numpy())) == [(2, "b")]


def test_pack_chunks(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.vocab import pack_chunks

    chunks = pd.DataFrame(
        {
            "doc_id": [1, 1, 1, 2, 2, 3],
            "chunk_idx": [0, 1, 2, 0, 1, 0],
            "n_tokens": [4, 3, 2, 9, 1, 5],
        }
    )
    got = (
        pack_chunks(
            rd.from_pandas(chunks).repartition(3),
            budget_tokens=7,
            num_partitions=1,  # one partition → assignment fully specified
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # order (1,0)(1,1)(1,2)(2,0)(2,1)(3,0) with budget 7:
    # [4,3] | [2] + 9 won't fit → [2] closes with the oversized 9? greedy:
    # pack1 = 4+3; pack2 = 2 (+9 exceeds); pack3 = 9 alone (oversized ok
    # only when single); then 1 joins? 9+1 > 7 → pack4 = 1+5
    packs = got.groupby("pack_id")[["n_tokens"]].sum()
    by_chunk = dict(zip(zip(got.doc_id, got.chunk_idx), got.pack_id))
    assert by_chunk[(1, 0)] == by_chunk[(1, 1)] == "1:0"
    assert by_chunk[(1, 2)] == "1:2"
    assert by_chunk[(2, 0)] == "2:0" and packs.loc["2:0", "n_tokens"] == 9
    assert by_chunk[(2, 1)] == by_chunk[(3, 0)] == "2:1"
    # every multi-chunk pack within budget
    sizes = got.groupby("pack_id").agg(n=("n_tokens", "sum"), c=("n_tokens", "size"))
    assert ((sizes.n <= 7) | (sizes.c == 1)).all()

    # determinism across runs (same partitioning)
    again = (
        pack_chunks(
            rd.from_pandas(chunks).repartition(2),
            budget_tokens=7, num_partitions=1,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert again.pack_id.tolist() == got.pack_id.tolist()


def test_column_quantiles(ray_session):
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.groupagg import column_quantiles

    vals = list(range(1, 11))  # 1..10
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3)
    got = column_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99], num_partitions=4)
    # DuckDB quantile_disc: index ceil(q*n)-1 → 1, 5, 9, 10
    assert got.value.tolist() == [1, 5, 9, 10]
    assert got.q.tolist() == [0.1, 0.5, 0.9, 0.99]


def test_decontaminate_bloom_mode(ray_session):
    """Bloom-broadcast decontamination: zero false negatives vs the
    exact mode, and at generous bits/key the verdicts match exactly."""
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.dedup import decontaminate_docs

    ref = pd.DataFrame(
        {"doc_id": [100, 101],
         "text": ["the quick brown fox jumps", "pack my box with jugs"]}
    )
    corpus = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                "the quick brown fox jumps over",   # contaminated
                "pack my box with jugs of wine",     # contaminated
                "totally unrelated text one two",
                "another clean document here now",
                "numbers 1 2 3 4 5 6",
                "alpha beta gamma delta epsilon",
                "red green blue yellow purple",
                "north south east west center",
            ],
        }
    )
    cds = rd.from_pandas(corpus).repartition(3)
    rds = rd.from_pandas(ref)
    exact = (
        decontaminate_docs(cds, rds, n=3)
        .to_pandas().set_index("doc_id").sort_index()
    )
    bloom = (
        decontaminate_docs(cds, rds, n=3, bloom_bits_per_key=20)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # no false negatives ever
    assert set(exact.index[~exact.is_clean]) <= set(bloom.index[~bloom.is_clean])
    # at 20 bits/key on this tiny set the fp probability is ~1e-6 → equal
    assert bloom.is_clean.tolist() == exact.is_clean.tolist()
    assert (bloom.n_hits >= exact.n_hits).all()


def test_new_ops_empty_inputs(ray_session):
    """Empty-corpus sweep over the round-3 operators: correct (possibly
    empty) outputs, no crashes, stable schemas."""
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.distinct import except_rows, intersect_rows
    from p5_rdf_rdb2rdf_ray.stages.groupagg import (
        column_quantiles,
        grouped_top_k,
    )
    from p5_rdf_rdb2rdf_ray.stages.sessions import hopping_window
    from p5_rdf_rdb2rdf_ray.stages.vocab import (
        chunk_docs,
        ngram_counts,
        pack_chunks,
        tfidf_top_terms,
    )

    empty_docs = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")})
    )
    assert ngram_counts(empty_docs, n=2).count() == 0
    assert tfidf_top_terms(empty_docs, n_docs=0, k=2).count() == 0
    assert chunk_docs(empty_docs, chunk_tokens=4).count() == 0
    empty_chunks = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "chunk_idx": pd.Series([], dtype="int64"),
                      "n_tokens": pd.Series([], dtype="int64")})
    )
    assert pack_chunks(empty_chunks, budget_tokens=8).count() == 0

    empty_ev = rd.from_pandas(
        pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                      "ts": pd.Series([], dtype="datetime64[us]"),
                      "value": pd.Series([], dtype="float64")})
    )
    assert hopping_window(empty_ev, 3600, 900).count() == 0

    some = rd.from_pandas(pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}))
    assert except_rows(some, empty_docs.map_batches(
        lambda t: t.rename_columns(["x", "y"]), batch_format="pyarrow"
    ), ["x", "y"], num_buckets=2).count() == 2
    assert intersect_rows(
        rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                     "y": pd.Series([], dtype="object")})),
        some, ["x", "y"], num_buckets=2,
    ).count() == 0

    q = column_quantiles(
        rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")})),
        "v", [0.5], num_partitions=2,
    )
    assert q.value.isna().all() and q.q.tolist() == [0.5]

    # docs with only-whitespace text exercise the zero-token branch
    ws = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["   "]}))
    assert chunk_docs(ws, 4).count() == 0
    assert ngram_counts(ws, n=1).count() == 0


def test_except_rows_null_semantics(ray_session):
    """SQL EXCEPT treats NULLs as equal: a row with a null column present
    in both sides must be removed (graph_diff relies on this — triple
    rows carry null lang/datatype/graph)."""
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.distinct import except_rows

    a = rd.from_pandas(
        pd.DataFrame({"x": [1, 2], "y": [None, None]}).astype({"y": "object"})
    )
    b = rd.from_pandas(
        pd.DataFrame({"x": [1], "y": [None]}).astype({"y": "object"})
    )
    got = except_rows(a, b, ["x", "y"], num_buckets=2).to_pandas()
    assert got.x.tolist() == [2]  # (1, NULL) removed — NULL == NULL


def test_resolve_rep_chain(ray_session):
    """exact_dup → (near_dup winner) chains collapse to the final kept
    doc after resolve_rep_chain; already-final rows unchanged."""
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.pipelines.clean import clean_corpus, resolve_rep_chain

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base + " extra"      # near-dup of base (high shingle overlap)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [base, near, near, "completely different words " * 4],
        }
    )
    verdicts = clean_corpus(
        rd.from_pandas(docs), min_words=5, max_punct_ratio=0.9,
        langs=None, neardup_tau=0.5, num_partitions=4,
    )
    raw = verdicts.to_pandas().set_index("doc_id")
    # doc2 exact-dups doc1; doc1 near-dups doc0 → chain
    assert raw.loc[2, "status"] == "exact_dup" and raw.loc[2, "rep_id"] == 1
    assert raw.loc[1, "status"] == "near_dup" and raw.loc[1, "rep_id"] == 0
    resolved = (
        resolve_rep_chain(
            clean_corpus(
                rd.from_pandas(docs), min_words=5, max_punct_ratio=0.9,
                langs=None, neardup_tau=0.5, num_partitions=4,
            ),
            num_partitions=4,
        )
        .to_pandas().set_index("doc_id")
    )
    assert resolved.loc[2, "rep_id"] == 0          # chain collapsed
    assert resolved.loc[2, "status"] == "exact_dup"  # status unchanged
    assert resolved.loc[1, "rep_id"] == 0
    assert resolved.loc[0, "status"] == "kept" and resolved.loc[0, "rep_id"] == 0
    assert resolved.loc[3, "status"] == "kept" and resolved.loc[3, "rep_id"] == 3


def test_hll_kernel_monoid_and_accuracy():
    """Block-wise fold + merge == one-shot fold (the property the
    distributed shape relies on); estimate within ~3σ of truth."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, size=200_000, dtype=np.uint64)
    parts = np.array_split(h, 37)
    merged = hll_merge([hll_partial(p, 12) for p in parts])
    assert np.array_equal(merged, hll_partial(h, 12))
    est = hll_estimate(merged)
    assert abs(est / 200_000 - 1) < 0.05
    # duplicates collapse
    dup = np.repeat(rng.integers(0, 2**64, size=1000, dtype=np.uint64), 500)
    assert abs(hll_estimate(hll_partial(dup, 12)) / 1000 - 1) < 0.05
    with pytest.raises(ValueError):
        hll_partial(h, 8)


def test_approx_ndistinct_dataset(ray_session):
    from p5_rdf_rdb2rdf_ray.stages.sketches import approx_ndistinct

    ids = np.arange(30_000) % 7_500  # 7500 distinct, 4 copies each
    ds = rd.from_arrow(pa.table({"k": ids})).repartition(8)
    row = approx_ndistinct(ds, ["k"]).to_pandas().iloc[0]
    assert abs(row["approx_ndistinct"] / 7_500 - 1) < 0.05
    # empty input → one row, estimate 0
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    row0 = approx_ndistinct(empty, ["k"]).to_pandas().iloc[0]
    assert row0["approx_ndistinct"] == 0


def test_approx_vocab_matches_exact_vocab(ray_session):
    """The n-gram HLL tracks the exact ngram_counts vocabulary size."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import approx_ndistinct_ngrams
    from p5_rdf_rdb2rdf_ray.stages.vocab import ngram_counts

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(300)]
    docs = pd.DataFrame(
        {
            "doc_id": range(400),
            "text": [
                " ".join(rng.choice(words, size=40)) for _ in range(400)
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(6)
    exact = ngram_counts(ds, n=2, min_count=1, num_partitions=4).count()
    est = (
        approx_ndistinct_ngrams(ds, n=2, p=12)
        .to_pandas()
        .iloc[0]["approx_ndistinct"]
    )
    assert abs(est / exact - 1) < 0.05


def test_approx_quantiles_rank_error(ray_session):
    """Mergeable quantile summary: rank error well under the levels/s
    bound on a skewed distribution, across real Dataset blocks."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import approx_quantiles

    rng = np.random.default_rng(3)
    x = rng.lognormal(0, 2, size=200_000)
    ds = rd.from_arrow(pa.table({"v": x})).repartition(32)
    out = approx_quantiles(ds, "v", [0.01, 0.5, 0.99], s=1024)
    xs = np.sort(x)
    for _, row in out.iterrows():
        true_rank = np.searchsorted(xs, row["value"]) / len(xs)
        assert abs(true_rank - row["q"]) < 0.01
    # empty input → NULL values, one row per requested q
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out0 = approx_quantiles(empty, "v", [0.5])
    assert len(out0) == 1 and out0["value"].isna().all()


def test_quantile_summary_merge_is_weight_aware():
    """Merging a heavy summary (many rows) with a light one must respect
    weights: the heavy side dominates the quantiles."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import (
        merge_summaries,
        quantile_summary,
    )

    heavy = quantile_summary(np.zeros(100_000), 64)   # weight ≈ 1562
    light = quantile_summary(np.ones(100), 64)        # weight 1
    v, w = merge_summaries([heavy, light], 64)
    # median of the merged population (100k zeros + 100 ones) is 0
    assert v[len(v) // 2] == 0.0
    assert np.isclose(w * len(v), 100_100, rtol=0.02)


def test_range_join_semantics(ray_session):
    """Interval-join semantics: lo inclusive / hi exclusive, intervals
    spanning many grid cells match once (no duplicate from replication),
    overlapping intervals multiply, empty/degenerate intervals drop."""
    from p5_rdf_rdb2rdf_ray.stages.asof import range_join

    left = rd.from_pandas(
        pd.DataFrame({"id": [1, 2, 3, 4], "v": [0.0, 9.99, 10.0, 55.0]})
    ).repartition(3)
    right = rd.from_pandas(
        pd.DataFrame(
            {
                "r": ["a", "b", "wide", "empty"],
                "lo": [0.0, 10.0, 5.0, 7.0],
                "hi": [10.0, 20.0, 60.0, 7.0],  # empty: hi == lo
            }
        )
    )
    out = range_join(
        left, right, "v", "lo", "hi",
        left_cols=["id"], right_cols=["r"],
        bucket_width=4.0, num_partitions=4,
        out_dtypes={"id": "int64"},
    ).to_pandas()
    pairs = sorted(map(tuple, out[["id", "r"]].values.tolist()))
    assert pairs == [
        (1, "a"),            # v=0 in [0,10)
        (2, "a"), (2, "wide"),  # v=9.99 in [0,10) and [5,60)
        (3, "b"), (3, "wide"),  # v=10 excluded from [0,10), in [10,20)
        (4, "wide"),         # v=55 only in [5,60) — spans 14 cells, ONE row
    ]


def test_transitive_closure_matches_bfs(ray_session):
    """Path-doubling closure vs a driver BFS reference on a seeded
    random digraph (branches, diamonds, a cycle, isolated chain)."""
    import random

    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.stages.paths import transitive_closure

    rng = random.Random(7)
    edges = {(rng.randrange(40), rng.randrange(40)) for _ in range(70)}
    edges |= {(100, 101), (101, 102), (102, 100)}  # cycle component
    edges = sorted(edges)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {
        (r["src"], r["dst"])
        for r in transitive_closure(ds, num_partitions=4).take_all()
    }
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    want = set()
    for s in list(adj):
        stack = list(adj[s])
        while stack:
            x = stack.pop()
            if (s, x) in want:
                continue
            want.add((s, x))
            stack.extend(adj.get(x, []))
    assert got == want


def test_p_plus_property_path_literal_no_splice(ray_session, tmp_path):
    """SPARQL pred+ over a materialized store: IRI chains close, literal
    objects join only as TERMINAL hops — a literal whose lexical form
    spells a node IRI must NOT splice two paths together."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.stages.paths import p_plus
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    P = N + "p"
    rows = [
        # chain a→b→c (IRIs) with a literal leaf off c
        (N + "a", N + "b", KIND_IRI),
        (N + "b", N + "c", KIND_IRI),
        (N + "c", "x", KIND_LITERAL),
        # splice trap: d →(LITERAL spelling e's IRI); e→f is real
        (N + "d", N + "e", KIND_LITERAL),
        (N + "e", N + "f", KIND_IRI),
    ]
    t = pa.table(
        {
            "subj": [s for s, _, _ in rows],
            "pred": [P] * len(rows),
            "obj": [o for _, o, _ in rows],
            "obj_kind": pa.array([k for _, _, k in rows], pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    store = str(tmp_path / "pstore")
    write_triplestore(rd.from_arrow(t), store, num_buckets=4)
    got = {
        (r["src"], r["dst"], r["dst_kind"])
        for r in p_plus(store, P, num_partitions=4).take_all()
    }
    I, L = KIND_IRI, KIND_LITERAL
    assert got == {
        (N + "a", N + "b", I), (N + "b", N + "c", I), (N + "a", N + "c", I),
        (N + "c", "x", L), (N + "b", "x", L), (N + "a", "x", L),
        (N + "d", N + "e", L),      # terminal literal hop only
        (N + "e", N + "f", I),      # no (d → f): literal never splices
    }


def test_rolling_aggregate_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.windows import rolling_aggregate

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 23, n),
            "seq": np.arange(n),
            "v": rng.integers(0, 100, n).astype("float64"),
        }
    )
    out = (
        rolling_aggregate(
            rd.from_pandas(df).repartition(6),
            keys=["k"],
            order_by=["seq"],
            aggs={
                "mv_sum": ("v", "sum", 4),
                "mv_min": ("v", "min", 4),
                "mv_cnt": ("v", "count", 4),
            },
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.sql(
        """
        SELECT *,
          sum(v)   OVER w AS mv_sum,
          min(v)   OVER w AS mv_min,
          count(v) OVER w AS mv_cnt
        FROM t WINDOW w AS (PARTITION BY k ORDER BY seq
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY k, seq
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)


def test_grouped_rank_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.windows import grouped_rank

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.choice(list("xyz"), n),
            "v": rng.integers(0, 40, n),  # heavy ties
            "u": np.arange(n),
        }
    )
    # total order -> every fn deterministic, incl. row_number and ntile
    out = (
        grouped_rank(
            rd.from_pandas(df).repartition(7),
            keys=["g"],
            order_by=["v", "u"],
            ranks={
                "rnum": ("row_number", None),
                "rk": ("rank", None),
                "drk": ("dense_rank", None),
                "prk": ("percent_rank", None),
                "nt": ("ntile", 5),
            },
            descending=[True, False],
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["g", "u"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.sql(
        """
        SELECT *, row_number() OVER w AS rnum, rank() OVER w AS rk,
               dense_rank() OVER w AS drk, percent_rank() OVER w AS prk,
               ntile(5) OVER w AS nt
        FROM t WINDOW w AS (PARTITION BY g ORDER BY v DESC, u ASC)
        ORDER BY g, u
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)

    # tie-only ordering: rank family must be peer-stable
    out2 = (
        grouped_rank(
            rd.from_pandas(df).repartition(7),
            keys=["g"],
            order_by=["v"],
            ranks={"rk": ("rank", None), "drk": ("dense_rank", None)},
            num_partitions=5,
        )
        .to_pandas()
        .groupby(["g", "v"])[["rk", "drk"]]
        .first()
        .sort_index()
    )
    ref2 = (
        con.sql(
            """
            SELECT g, v, rank() OVER w AS rk, dense_rank() OVER w AS drk
            FROM t WINDOW w AS (PARTITION BY g ORDER BY v)
            """
        )
        .df()
        .groupby(["g", "v"])[["rk", "drk"]]
        .first()
        .sort_index()
    )
    pd.testing.assert_frame_equal(out2, ref2.astype(out2.dtypes.to_dict()))


def test_pivot_counts_and_cube(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.groupagg import cube_aggregate, pivot_counts

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n),
            "a": rng.choice(["p", "q", "r"], n),
            "b": rng.choice(["s", "t"], n),
            "x": rng.integers(0, 1000, n),
        }
    )
    con = duckdb.connect()
    con.register("t", df)

    out = (
        pivot_counts(
            rd.from_pandas(df).repartition(6),
            keys=["k"], col="a", values=["p", "q"], total="n_total",
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = con.sql(
        """
        SELECT k,
          CAST(sum(CASE WHEN a='p' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
          CAST(sum(CASE WHEN a='q' THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
          count(*) AS n_total
        FROM t GROUP BY k ORDER BY k
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)

    cube = cube_aggregate(
        rd.from_pandas(df).repartition(6),
        keys=["a", "b"],
        aggs={"n": ("x", "count"), "mx": ("x", "max")},
        num_partitions=5,
    ).to_pandas()
    refc = con.sql(
        "SELECT a, b, count(*) AS n, max(x) AS mx FROM t GROUP BY CUBE(a, b)"
    ).df()
    key = ["a", "b"]
    a_ = cube.sort_values(key, na_position="first").reset_index(drop=True)
    b_ = refc.sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a_, b_[a_.columns].astype(a_.dtypes.to_dict()), check_dtype=True
    )
    assert len(cube) == len(refc)


def test_oov_stats_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.vocab import oov_stats

    rng = np.random.default_rng(19)
    words = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(200),
            "text": [
                " ".join(rng.choice(words, rng.integers(3, 40)))
                for _ in range(200)
            ],
        }
    )
    out = (
        oov_stats(rd.from_pandas(docs).repartition(4), vocab_k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    ref = con.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
          FROM documents
        ),
        cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        vocab AS (SELECT term FROM cnt ORDER BY c DESC, term LIMIT 8)
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(CASE WHEN term NOT IN (SELECT term FROM vocab)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               CAST(sum(CASE WHEN term NOT IN (SELECT term FROM vocab)
                        THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
        FROM toks GROUP BY doc_id ORDER BY doc_id
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)


def test_shared_shingle_stats_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.dedup import shared_shingle_stats

    rng = np.random.default_rng(23)
    words = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(words, rng.integers(1, 25))) for _ in range(150)]
    texts[7] = texts[3]  # exact dup -> every shingle shared
    docs = pd.DataFrame({"doc_id": np.arange(150), "text": texts})
    out = (
        shared_shingle_stats(
            rd.from_pandas(docs).repartition(5), n=3, num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    ref = con.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
          FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(g)
        ),
        cnt AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
        SELECT doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) AS shared_rate
        FROM sh JOIN cnt USING (s) GROUP BY doc_id ORDER BY doc_id
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)
    # the duplicated pair is fully shared
    dup = out[out.doc_id.isin([3, 7])]
    assert (dup.shared_rate == 1.0).all()


def test_zscore_column_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.profile import zscore_column

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {"id": np.arange(1000), "x": rng.integers(0, 5000, 1000)}
    )
    out = (
        zscore_column(
            rd.from_pandas(df).repartition(6), col="x", id_cols=["id"]
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.sql(
        """
        WITH stats AS (
          SELECT CAST(sum(x) AS DOUBLE) AS s,
                 CAST(sum(x * x) AS DOUBLE) AS ss,
                 CAST(count(x) AS DOUBLE) AS n FROM t
        ),
        m AS (SELECT s / n AS mean, sqrt(ss / n - (s / n) * (s / n)) AS std
              FROM stats)
        SELECT id, x, (CAST(x AS DOUBLE) - mean) / std AS z FROM t, m
        ORDER BY id
        """
    ).df().reset_index(drop=True)
    # bit-exact: the stage mirrors the SQL's IEEE op sequence
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)

    with pytest.raises(Exception):
        zscore_column(
            rd.from_pandas(pd.DataFrame({"x": [1.5, 2.5]})), col="x"
        ).materialize()


def test_funnel_conversion_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.sessions import funnel_conversion

    rng = np.random.default_rng(37)
    n = 4000
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "event_type": rng.choice(
                ["view", "purchase", "click"], n, p=[0.5, 0.1, 0.4]
            ),
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    out = (
        funnel_conversion(
            rd.from_pandas(ev).repartition(5),
            step_a="view",
            step_b="purchase",
            within_s=3600.0,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", ev)
    ref = con.sql(
        """
        WITH conv AS (
          SELECT DISTINCT a.user_id
          FROM events a JOIN events b USING (user_id)
          WHERE a.event_type = 'view' AND b.event_type = 'purchase'
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        )
        SELECT user_id,
          CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_a,
          CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_b,
          CAST(user_id IN (SELECT user_id FROM conv) AS BIGINT) AS converted
        FROM events GROUP BY user_id ORDER BY user_id
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)
    assert out.converted.sum() > 0  # fixture actually converts somewhere


def test_cohort_retention_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.sessions import cohort_retention

    rng = np.random.default_rng(41)
    n = 3000
    ev = pd.DataFrame(
        {
            # sparse users: many first appear in a later month, so the
            # matrix has multiple cohorts, not just January
            "user_id": rng.integers(0, 1500, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 200 * 86400, n), unit="s"),
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    out = (
        cohort_retention(rd.from_pandas(ev).repartition(5), num_partitions=4)
        .to_pandas()
        .sort_values(["cohort_month", "active_month"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", ev)
    ref = con.sql(
        """
        WITH first AS (
          SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
          FROM events GROUP BY 1
        ),
        act AS (
          SELECT DISTINCT user_id, date_trunc('month', ts) AS active_month
          FROM events
        )
        SELECT cohort_month, active_month, count(*) AS n_users
        FROM first JOIN act USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df().reset_index(drop=True)
    assert len(out) > 10  # multi-month fixture
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)


def test_inverted_index_matches_duckdb(ray_session):
    import duckdb

    from p5_rdf_rdb2rdf_ray.stages.vocab import inverted_index

    rng = np.random.default_rng(43)
    words = [f"w{i}" for i in range(25)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(120),
            "text": [
                " ".join(rng.choice(words, rng.integers(1, 30)))
                for _ in range(120)
            ],
        }
    )
    out = (
        inverted_index(
            rd.from_pandas(docs).repartition(4), min_df=3, num_partitions=4
        )
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    ref = con.sql(
        r"""
        WITH pairs AS (
          SELECT DISTINCT doc_id,
                 unnest(regexp_extract_all(lower(text), '\S+')) AS term
          FROM documents
        )
        SELECT term, count(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                 AS postings
        FROM pairs GROUP BY term HAVING count(*) >= 3 ORDER BY term
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref, check_dtype=True)


def test_parse_path_precedence():
    from p5_rdf_rdb2rdf_ray.stages.paths import parse_path

    P, Q, R = "http://n/p", "http://n/q", "http://n/r"
    assert parse_path(f"<{P}>") == ("pred", P)
    # | binds loosest, / tighter, unary/postfix tightest
    assert parse_path(f"<{P}>/<{Q}>|<{R}>") == (
        "alt", ("seq", ("pred", P), ("pred", Q)), ("pred", R)
    )
    # ^ applies to the element INCLUDING its modifier (PathEltOrInverse)
    assert parse_path(f"^<{P}>+") == ("inv", ("plus", ("pred", P)))
    assert parse_path(f"(^<{P}>)/(<{Q}>|<{R}>)*") == (
        "seq",
        ("inv", ("pred", P)),
        ("star", ("alt", ("pred", Q), ("pred", R))),
    )
    assert parse_path(f"!(<{P}>|<{Q}>)") == ("nps", [P, Q])
    assert parse_path(f"!<{P}>?") == ("opt", ("nps", [P]))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_path(f"<{P}>/")
    with _pytest.raises(ValueError):
        parse_path("p:q")  # CURIEs not accepted — fail loud


def _path_store(tmp_path, rows):
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    t = pa.table(
        {
            "subj": [s for s, _, _, _ in rows],
            "pred": [p for _, p, _, _ in rows],
            "obj": [o for _, _, o, _ in rows],
            "obj_kind": pa.array([k for _, _, _, k in rows], pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    store = str(tmp_path / "pathstore")
    write_triplestore(rd.from_arrow(t), store, num_buckets=4)
    return store


def test_eval_path_algebra(ray_session, tmp_path):
    """Full §9.1 algebra over a materialized store: seq keeps BAG
    multiplicity (two mid nodes ⇒ duplicate pair), alt unions without
    dedup, NPS filters predicates, ?/* add the zero-length identity
    over EVERY graph term (literals included), and a literal whose
    lexical form spells a node IRI never splices a sequence."""
    from collections import Counter

    from p5_rdf_rdb2rdf_ray.stages.paths import eval_path
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    P, Q = N + "p", N + "q"
    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        # a -P-> m1 -Q-> z   and   a -P-> m2 -Q-> z  (duplicate (a,z))
        (N + "a", P, N + "m1", I),
        (N + "a", P, N + "m2", I),
        (N + "m1", Q, N + "z", I),
        (N + "m2", Q, N + "z", I),
        # splice trap: d -P-> literal spelling e's IRI; e -Q-> f is real
        (N + "d", P, N + "e", L),
        (N + "e", Q, N + "f", I),
    ]
    store = _path_store(tmp_path, rows)

    def pairs(path):
        return Counter(
            (r["src"], r["dst"])
            for r in eval_path(store, path, num_partitions=4).take_all()
        )

    a, z = f"<{N}a>", f"<{N}z>"
    # sequence: bag semantics — (a,z) appears TWICE (two mid nodes);
    # the d → "…e" literal edge never joins e's outgoing Q edge
    seq = pairs(f"<{P}>/<{Q}>")
    assert seq == Counter({(a, z): 2})
    # alternative: plain union, duplicates preserved (6 edges total)
    alt = pairs(f"<{P}>|<{Q}>")
    assert sum(alt.values()) == 6 and alt[(f"<{N}d>", f'"{N}e"')] == 1
    # negated property set: everything but P = the Q edges
    nps = pairs(f"!<{P}>")
    assert set(nps) == {
        (f"<{N}m1>", z), (f"<{N}m2>", z), (f"<{N}e>", f"<{N}f>")
    }
    # zero-or-one: Q edges + identity over ALL graph terms — subjects,
    # IRI objects, and the literal term
    opt = pairs(f"<{Q}>?")
    terms = {
        f"<{N}{x}>" for x in ("a", "m1", "m2", "z", "d", "e", "f")
    } | {f'"{N}e"'}
    assert opt == Counter(
        {(t, t): 1 for t in terms}
        | {(f"<{N}m1>", z): 1, (f"<{N}m2>", z): 1, (f"<{N}e>", f"<{N}f>"): 1}
    )
    # star == plus ∪ identity, and plus of the 2-hop chain closes a→z
    star = pairs(f"(<{P}>|<{Q}>)*")
    plus = pairs(f"(<{P}>|<{Q}>)+")
    assert (a, z) in plus and all(v == 1 for v in plus.values())
    assert star == plus | Counter({(t, t): 1 for t in terms})
    # inverse of a sequence element: z reached backwards
    inv = pairs(f"^<{Q}>")
    assert (z, f"<{N}m1>") in inv and (z, f"<{N}m2>") in inv


def test_heavy_hitters_bounds(ray_session):
    """Misra–Gries guarantees on a skewed stream with FORCED truncation
    (tiny k, many blocks): for every reported item the true count f
    satisfies cnt ≤ f ≤ cnt + err, and every item with
    f > n/(k+1) is reported. Exact mode (k ≥ distinct) returns exact
    counts with err = 0."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: a few heavy keys + a long tail
    vals = (
        ["hot_a"] * 4000 + ["hot_b"] * 2500 + ["hot_c"] * 1200
        + [f"tail_{i}" for i in rng.integers(0, 800, 6000)]
    )
    rng.shuffle(vals)
    true = Counter(vals)
    n, k = len(vals), 16
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(20)

    got = heavy_hitters(ds, "v", k=k, limit=k).take_all()
    assert 0 < len(got) <= k
    reported = {r["item"] for r in got}
    for r in got:
        f = true[r["item"]]
        assert r["cnt"] <= f <= r["cnt"] + r["err"], (r, f)
    for item, f in true.items():
        if f > n / (k + 1):
            assert item in reported, (item, f)

    # exact mode: k ≥ distinct — no truncation, err 0, exact counts
    exact = heavy_hitters(ds, "v", k=4096, limit=4096).take_all()
    assert {(r["item"], r["cnt"]) for r in exact} == set(true.items())
    assert all(r["err"] == 0 for r in exact)


def test_bgp_path_unit_composition(ray_session, tmp_path):
    """Property-path items inside the store BGP planner: a path with a
    BOUND source endpoint filters the relation; a shared variable joins
    path bindings against ordinary pattern bindings; a fully-bound path
    acts as an existence probe (1-row cross unit when satisfied, empty
    otherwise); literal-capable endpoints carry term-kind columns so a
    literal spelling an IRI never joins it."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern_store
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    P, Q, NAME = N + "p", N + "q", N + "name"
    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        (N + "a", P, N + "b", I),
        (N + "b", Q, N + "c", I),
        (N + "a", NAME, "alpha", L),
        (N + "c", NAME, "gamma", L),
        # literal trap: spells b's IRI but is a literal
        (N + "x", P, N + "b", L),
    ]
    store = _path_store(tmp_path, rows)

    # seq path ?s <p>/<q> ?o joined with ?s <name> ?nm on shared ?s;
    # x must NOT reach c (its p-edge object is a literal)
    got = get_pattern_store(
        store,
        [("?s", NAME, "?nm")],
        paths=[("?s", f"<{P}>/<{Q}>", "?o")],
        num_partitions=4,
    ).take_all()
    assert [(r["s"], r["nm"], r["o"]) for r in got] == [
        (N + "a", "alpha", N + "c")
    ]

    # bound source endpoint: (a, <p>+, ?o)
    got = get_pattern_store(
        store, [], paths=[(N + "a", f"<{P}>+", "?o")], num_partitions=4
    ).take_all()
    assert {r["o"] for r in got} == {N + "b"}

    # bound literal object: ?s reaches the literal "alpha" via <name>
    got = get_pattern_store(
        store, [], paths=[("?s", f"<{NAME}>", ("lit", "alpha"))],
        num_partitions=4,
    ).take_all()
    assert {r["s"] for r in got} == {N + "a"}

    # fully bound: existence probe gates the other pattern
    sat = get_pattern_store(
        store,
        [("?s", NAME, "?nm")],
        paths=[(N + "a", f"<{P}>/<{Q}>", N + "c")],
        num_partitions=4,
    ).take_all()
    assert len(sat) == 2  # both name bindings survive the probe
    unsat = get_pattern_store(
        store,
        [("?s", NAME, "?nm")],
        paths=[(N + "a", f"<{P}>/<{Q}>", N + "b")],
        num_partitions=4,
    ).take_all()
    assert unsat == []

    # literal-capable endpoint carries kinds: ?o of <p> can be literal —
    # keep_kinds exposes __k_o and distinguishes x's literal edge
    got = get_pattern_store(
        store, [], paths=[("?s", f"<{P}>", "?o")],
        num_partitions=4, keep_kinds=True,
    ).take_all()
    kinds = {(r["s"], r["o"]): r["__k_o"] for r in got}
    assert kinds[(N + "a", N + "b")] == I and kinds[(N + "x", N + "b")] == L


def test_levenshtein_batch_matches_reference():
    """Batched numpy DP == the textbook per-pair DP, including empty
    strings, unicode, and unequal lengths."""
    import numpy as np

    from p5_rdf_rdb2rdf_ray.stages.fuzzy import levenshtein_batch

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(3)
    alpha = list("abcdeü∂")
    pairs = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
    for _ in range(200):
        a = "".join(rng.choice(alpha, rng.integers(0, 12)))
        b = "".join(rng.choice(alpha, rng.integers(0, 12)))
        pairs.append((a, b))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = [ref(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_fuzzy_join_blocked(ray_session):
    """Blocked fuzzy join: matches within the block and max_dist; an
    edit INSIDE the blocking suffix is missed (the documented blocking
    trade-off), a too-distant pair is dropped."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.stages.fuzzy import fuzzy_join

    left = rd.from_arrow(
        pa.table({"a": ["hello world", "foo bar", "same suffix"]})
    )
    right = rd.from_arrow(
        pa.table(
            {
                "b": [
                    "hallo world",    # dist 1, same last-6 "⊃ world"
                    "foo bat",        # edit in the suffix → different block
                    "sane suffix",    # dist 1, same suffix
                    "xxxx suffix",    # same block, dist 4 → dropped
                ]
            }
        )
    )
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_join(
            left, right, "a", "b", max_dist=2, block_last=6,
            num_partitions=4,
        ).take_all()
    }
    assert got == {
        ("hello world", "hallo world", 1),
        ("same suffix", "sane suffix", 1),
    }


def test_get_pattern_dm_paths(ray_session):
    """paths= on the DM planner (virtual graph, no store): the two-hop
    FK sequence path composes with an ordinary pattern on the shared
    variable."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern
    from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import BASE, catalog_for

    cat = catalog_for("/root/testdata/sf0.001")
    got = get_pattern(
        cat,
        [("?n", BASE + "nation#n_name", "?nm")],
        base=BASE,
        paths=[
            (
                "?n",
                f"<{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name>",
                "?rn",
            )
        ],
    ).take_all()
    assert len(got) == 25
    assert all(r["n"].startswith(BASE + "nation/") for r in got)
    assert len({r["rn"] for r in got}) == 5  # the five region names


def test_void_statistics_kind_distinct(ray_session, tmp_path):
    """VoID stats count object TERMS: a literal spelling a node IRI is
    a distinct object from the IRI itself; duplicate-free triple and
    subject counts per predicate."""
    from p5_rdf_rdb2rdf_ray.engine.void import void_statistics
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    P, Q = N + "p", N + "q"
    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        (N + "a", P, N + "b", I),
        (N + "c", P, N + "b", L),   # literal spelling b's IRI → distinct
        (N + "a", Q, "x", L),
        (N + "c", Q, "x", L),       # same literal twice → ONE object
    ]
    store = _path_store(tmp_path, rows)
    got = {
        r["pred"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in void_statistics(store, num_partitions=4).take_all()
    }
    assert got == {P: (2, 2, 2), Q: (2, 2, 1)}


def test_normalize_json_corr_edges(ray_session):
    """Edge cases for the late-round operators: NFC canonical
    equivalence + in-place replace (normalize_text); malformed JSON and
    missing paths → NULL (json_extract_fields); non-integer input →
    TypeError, NULLs → ValueError (pearson_corr)."""
    import pyarrow as pa
    import pytest as _pytest

    from p5_rdf_rdb2rdf_ray.stages.jsonx import json_extract_fields
    from p5_rdf_rdb2rdf_ray.stages.profile import pearson_corr
    from p5_rdf_rdb2rdf_ray.stages.textstats import normalize_text

    # NFC: decomposed é (e + U+0301) normalizes equal to composed é
    ds = rd.from_arrow(
        pa.table({"id": [1, 2], "text": ["Café  X", "café x"]})
    )
    got = {r["id"]: r["text"] for r in normalize_text(ds).take_all()}
    assert got[1] == got[2] == "café x"

    j = rd.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4],
                "props": ['{"k": 5}', "not json", "{}", None],
            }
        )
    )
    rows = {
        r["id"]: r["k"]
        for r in json_extract_fields(
            j, "props", {"k": ("$.k", "int64")}
        ).take_all()
    }
    assert rows == {1: 5, 2: None, 3: None, 4: None}

    f = rd.from_arrow(pa.table({"x": [1.0, 2.0], "y": [1, 2]}))
    with _pytest.raises(Exception):  # TypeError surfaces via Ray task
        pearson_corr(f, "x", "y").take_all()
    n = rd.from_arrow(
        pa.table({"x": pa.array([1, None], pa.int64()), "y": [1, 2]})
    )
    with _pytest.raises(Exception):
        pearson_corr(n, "x", "y").take_all()
    # perfect correlation sanity (one fixed IEEE tree — not exactly 1.0)
    g = rd.from_arrow(pa.table({"x": [1, 2, 3], "y": [10, 20, 30]}))
    assert abs(pearson_corr(g, "x", "y").take_all()[0]["r"] - 1.0) < 1e-12


def test_path_endpoint_escaped_literal(ray_session, tmp_path):
    """ADVICE r4: a bound literal path endpoint whose value contains
    quotes/backslashes/newlines must compare by RAW lexical form, not
    the NT-escaped body (escaped vs unescaped silently matched nothing)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern_store
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    NAME = N + "name"
    tricky = 'say "hi"\\now\nline'
    rows = [
        (N + "a", NAME, tricky, KIND_LITERAL),
        (N + "b", NAME, "plain", KIND_LITERAL),
        (N + "a", N + "p", N + "b", KIND_IRI),
    ]
    store = _path_store(tmp_path, rows)
    got = get_pattern_store(
        store, [], paths=[("?s", f"<{NAME}>", ("lit", tricky))],
        num_partitions=4,
    ).take_all()
    assert {r["s"] for r in got} == {N + "a"}
    # and the fully-bound probe form (both endpoints bound, obj literal)
    sat = get_pattern_store(
        store,
        [("?x", N + "p", "?y")],
        paths=[(N + "a", f"<{NAME}>", ("lit", tricky))],
        num_partitions=4,
    ).take_all()
    assert len(sat) == 1
    # ADVICE r4: the internal probe column must not leak into solutions
    assert "__path_probe" not in sat[0]


def test_grouped_heavy_hitters_null_group(ray_session):
    """ADVICE r4: a NULL group key (pandas groupby yields NaN) must not
    crash the string-typed summary row; NULL groups aggregate together."""
    from p5_rdf_rdb2rdf_ray.stages.sketches import grouped_heavy_hitter_tokens

    t = pa.table(
        {
            "lang": pa.array(["en", None, None, "en"], pa.string()),
            "text": ["a a b", "c c d", "c e", "a b b"],
        }
    )
    got = grouped_heavy_hitter_tokens(
        rd.from_arrow(t), "lang", k=64, limit=2, num_partitions=2
    ).take_all()
    by_g = {}
    for r in got:
        by_g.setdefault(r["lang"], []).append((r["item"], r["cnt"]))
    assert sorted(by_g[None]) == [("c", 3), ("d", 1)] or sorted(
        by_g[None]
    ) == [("c", 3), ("e", 1)]
    assert ("a", 3) in by_g["en"] and ("b", 3) in by_g["en"]


def test_pearson_corr_overflow_exact(ray_session):
    """ADVICE r4: block sums of checked int64 products fold in
    decimal128 — a single block whose Σx² exceeds int64 must compute the
    exact r instead of silently wrapping."""
    from p5_rdf_rdb2rdf_ray.stages.profile import pearson_corr

    big = 2**31  # squares ~4.6e18; three of them overflow int64
    xs = [big, big, big, 1, 2, 3]
    ys = [big, big - 7, big + 5, 2, 1, 9]
    ds = rd.from_arrow(
        pa.table({"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64())})
    ).repartition(1)
    got = pearson_corr(ds, "x", "y").take_all()[0]
    import math

    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
        float(n * syy - sy * sy)
    )
    assert got["n"] == n and got["r"] == num / den


def _store_at(tmp_path, name, rows, num_buckets=4):
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    t = pa.table(
        {
            "subj": [s for s, _, _, _ in rows],
            "pred": [p for _, p, _, _ in rows],
            "obj": [o for _, _, o, _ in rows],
            "obj_kind": pa.array([k for _, _, _, k in rows], pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    out = str(tmp_path / name)
    write_triplestore(rd.from_arrow(t), out, num_buckets=num_buckets)
    return out


def test_federated_store_union_semantics(ray_session, tmp_path):
    """get_pattern_store over a LIST of stores == the same query over
    the compacted union store; duplicate triples across members
    collapse; mismatched bucket layouts fall back to per-pattern joins
    with identical results; paths and DESCRIBE work federated."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        describe_store,
        get_pattern_store,
    )
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

    N = "http://n/"
    I, L = KIND_IRI, KIND_LITERAL
    base_rows = [
        (N + "a", N + "p", N + "b", I),
        (N + "a", N + "name", "alpha", L),
        (N + "b", N + "name", "beta", L),
    ]
    delta_rows = [
        (N + "b", N + "p", N + "c", I),
        (N + "c", N + "name", "gamma", L),
        # overlap: duplicates a triple already in base
        (N + "a", N + "name", "alpha", L),
    ]
    base = _store_at(tmp_path, "base", base_rows, num_buckets=4)
    delta = _store_at(tmp_path, "delta", delta_rows, num_buckets=4)
    merged = _store_at(
        tmp_path, "merged", base_rows + delta_rows[:-1], num_buckets=4
    )

    pats = [("?x", N + "p", "?y"), ("?y", N + "name", "?nm")]
    fed = sorted(
        (r["x"], r["y"], r["nm"])
        for r in get_pattern_store([base, delta], pats).take_all()
    )
    one = sorted(
        (r["x"], r["y"], r["nm"])
        for r in get_pattern_store(merged, pats).take_all()
    )
    assert fed == one == [
        (N + "a", N + "b", "beta"),
        (N + "b", N + "c", "gamma"),
    ]

    # star group with duplicated triple: solutions still collapse
    star = get_pattern_store(
        [base, delta], [("?s", N + "name", "?nm")]
    ).take_all()
    assert sorted((r["s"], r["nm"]) for r in star) == [
        (N + "a", "alpha"), (N + "b", "beta"), (N + "c", "gamma"),
    ]

    # mismatched bucket layout → fusion falls back, same answers
    delta2 = _store_at(tmp_path, "delta2", delta_rows, num_buckets=2)
    fed2 = sorted(
        (r["x"], r["y"], r["nm"])
        for r in get_pattern_store([base, delta2], pats).take_all()
    )
    assert fed2 == one

    # federated path: closure spans the two members (a→b in base,
    # b→c in delta)
    reach = get_pattern_store(
        [base, delta], [], paths=[("?x", f"<{N}p>+", "?y")]
    ).take_all()
    assert sorted((r["x"], r["y"]) for r in reach) == [
        (N + "a", N + "b"), (N + "a", N + "c"), (N + "b", N + "c"),
    ]

    # federated DESCRIBE: the duplicated triple appears once
    d = describe_store([base, delta], N + "a").take_all()
    assert sorted((r["pred"], r["obj"]) for r in d) == [
        (N + "name", "alpha"), (N + "p", N + "b"),
    ]

    # sparql() accepts the list source
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql

    s = sparql(
        [base, delta],
        f'SELECT ?s WHERE {{ ?s <{N}name> "gamma" }}',
    ).take_all()
    assert [r["s"] for r in s] == [N + "c"]


def test_split_assign(ray_session):
    """Deterministic split assignment: fractions respected (±2% at
    10k keys), membership is a pure function of the key (stable across
    partitionings), bad fractions reject."""
    from p5_rdf_rdb2rdf_ray.stages.sample import split_assign

    t = pa.table({"doc_id": pa.array(range(10_000), pa.int64())})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = (
        split_assign(rd.from_arrow(t), fr, seed=3)
        .to_pandas().set_index("doc_id")["split"]
    )
    counts = a.value_counts(normalize=True)
    for name, f in fr.items():
        assert abs(counts[name] - f) < 0.02
    b = (
        split_assign(rd.from_arrow(t).repartition(7), fr, seed=3)
        .to_pandas().set_index("doc_id")["split"]
    )
    assert a.sort_index().equals(b.sort_index())  # layout-independent
    with pytest.raises(ValueError, match="sum to 1.0"):
        split_assign(rd.from_arrow(t), {"a": 0.5, "b": 0.4})


def test_bpe_encode_matches_reference(ray_session):
    """bpe_encode token counts equal a sequential greedy-by-rank
    reference encoder over the same learned merges."""
    from p5_rdf_rdb2rdf_ray.stages.bpe import bpe_encode, learn_bpe

    texts = [
        "the cat sat on the mat",
        "the mat sat on the cat cat",
        "a catalog of matters",
        "",
    ] * 5
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    merges = learn_bpe(
        rd.from_arrow(docs), num_merges=8, merges_per_round=1, min_freq=1
    )
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
    }

    def ref_encode(w):
        syms = list(w)
        while len(syms) > 1:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            rank, _ = min(cands)
            pair = None
            for l, r in ranks:
                if ranks[(l, r)] == rank:
                    pair = (l, r)
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    res.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    got = (
        bpe_encode(rd.from_arrow(docs), merges, concurrency=2)
        .to_pandas()
        .set_index("doc_id")
    )
    for i, txt in enumerate(texts):
        words = txt.lower().split()
        want = sum(len(ref_encode(w)) for w in words)
        assert got["n_tokens"][i] == want, (i, txt)
        # head_tokens = first 8 tokens of the DOCUMENT across words
        want_head = [tok for w in words for tok in ref_encode(w)][:8]
        assert list(got["head_tokens"][i]) == want_head, (i, txt)
