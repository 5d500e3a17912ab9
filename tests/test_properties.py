"""Model-based property tests (hypothesis): the distributed operators
must agree with a direct single-threaded Python model on arbitrary
inputs — partitioning, order, and cluster layout must never change a
result that is defined to be a pure function of the data."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.pack import (
    pack_sequences,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.sampling import (
    proportional_resample,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks.layout import (
    zorder_key,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=200),
)
@_SETTINGS
def test_pack_sequences_matches_python_model(spark, sizes, budget):
    rows = [("g", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "g string, i int, size int")
    got = {
        r["i"]: r["block_id"]
        for r in pack_sequences(df.repartition(3), "g", "i", "size", budget).collect()
    }
    cum = 0
    for i, s in enumerate(sizes):
        assert got[i] == cum // budget, (i, sizes, budget, got)
        cum += s


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_zorder_key_matches_python_model(spark, pairs):
    def morton(x: int, y: int, bits: int = 10) -> int:
        out = 0
        for j in range(bits):
            out |= ((x >> j) & 1) << (2 * j)
            out |= ((y >> j) & 1) << (2 * j + 1)
        return out

    df = spark.createDataFrame(pairs, "x int, y int")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == morton(r["x"], r["y"]), r


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=2, max_size=60, unique=True
    ),
    n_strata=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_proportional_resample_matches_python_model(spark, ids, n_strata):
    rows = [(i, f"s{i % n_strata}") for i in ids]
    df = spark.createDataFrame(rows, "id long, s string")
    kept = {
        r["id"] for r in proportional_resample(df.repartition(5), "s", "id").collect()
    }

    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    min_c = min(counts.values())
    expect = set()
    for i, s in rows:
        h = int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16)
        if h * counts[s] < (1 << 32) * min_c:
            expect.add(i)
    assert kept == expect, (sorted(kept ^ expect), counts)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
    ),
)
@_SETTINGS
def test_skyline_matches_python_model(spark, pts):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.skyline import (
        skyline_2d,
    )

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size int")

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )

    expected = sorted(r[0] for r in rows if not dominated(r))
    got = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
    assert got == expected


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    qn_qd=st.sampled_from([(1, 2), (1, 4), (9, 10), (1, 100), (99, 100)]),
)
@_SETTINGS
def test_exact_quantile_disc_model(spark, vals, qn_qd):
    """Histogram-pick quantile == indexing the sorted values at the
    1-based ceil(q*N) position, for arbitrary multisets (duplicates,
    negatives, singleton groups) and any partition layout."""
    import math as _m

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.buckets import (
        exact_quantile_disc,
    )

    qn, qd = qn_qd
    df = spark.createDataFrame([(v,) for v in vals], "v int").repartition(4)
    got = exact_quantile_disc(df, "v", {"q": (qn, qd)}).collect()[0]["q"]
    s = sorted(vals)
    want = s[_m.ceil(qn / qd * len(s)) - 1]
    assert got == want, (vals, qn, qd, got, want)


@given(
    hist=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=30,
    ),
    qn_qd=st.sampled_from([(1, 2), (1, 4), (3, 4), (9, 10)]),
)
@_SETTINGS
def test_exact_quantile_disc_weighted_equals_exploded(spark, hist, qn_qd):
    """count_col semantics: feeding a (value, multiplicity) histogram
    must give exactly the per-row result of exploding it back to raw
    rows — including zero multiplicities contributing nothing and the
    all-zero edge yielding NULL."""
    import math as _m

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.buckets import (
        exact_quantile_disc,
    )

    qn, qd = qn_qd
    df = spark.createDataFrame(hist, "v int, n int").repartition(3)
    got = exact_quantile_disc(
        df, "v", {"q": (qn, qd)}, count_col="n"
    ).collect()[0]["q"]
    exploded = sorted(v for v, n in hist for _ in range(n))
    want = (
        exploded[_m.ceil(qn / qd * len(exploded)) - 1] if exploded else None
    )
    assert got == want, (hist, qn, qd, got, want)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    parts=st.integers(min_value=1, max_value=6),
)
@_SETTINGS
def test_global_running_sum_model(spark, vals, parts):
    """Two-level prefix sum == Python itertools.accumulate on the sorted
    values, for arbitrary data and partition counts."""
    from itertools import accumulate

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.prefix import (
        global_running_sum,
    )

    rows = list(enumerate(vals))  # unique id as tiebreak
    df = spark.createDataFrame(rows, "id long, v long").repartition(3)
    got = {
        r["id"]: r["run"]
        for r in global_running_sum(
            df, ["v", "id"], F.col("v"), out_col="run", num_partitions=parts
        ).collect()
    }
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    want = dict(zip([i for i, _ in order], accumulate(v for _, v in order)))
    assert got == want, (vals, parts, got, want)


@given(
    members=st.sets(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=50),
    probes=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50),
)
@_SETTINGS
def test_bloom_no_false_negatives_model(spark, members, probes):
    """Structural guarantee on arbitrary key sets: every member probes
    True; non-members may collide but never the reverse."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    mdf = spark.createDataFrame([(k,) for k in members] or [(None,)], "k long").dropna()
    bloom = bloom_build(mdf, "k", m_bits=2048)
    pdf = spark.createDataFrame([(k,) for k in probes], "k long")
    res = {r["k"]: r["bloom_maybe"] for r in bloom_probe(pdf, "k", bloom, m_bits=2048).collect()}
    for k in probes & members:
        assert res[k] is True, (k, members)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abXY.", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_bpe_pair_counts_matches_python_model(spark, docs, tmp_path_factory):
    """x_bpe_pair_counts == a direct Counter model: per distinct
    lowercased word weighted by corpus frequency, count adjacent char
    pairs; top-30 by (count desc, pair asc)."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("bpe")
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    wf = Counter()
    for _, text in rows:
        for w in text.strip().split():
            if w:
                wf[w.lower()] += 1
    pairs = Counter()
    for w, n in wf.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:30]

    got = [
        (r["pair"], r["cnt"])
        for r in catalog.queries()["x_bpe_pair_counts"](spark, str(tmp)).collect()
    ]
    assert got == want, (docs, got, want)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=3),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_word_entropy_matches_python_model(spark, docs, tmp_path_factory):
    """x_word_entropy_quality == ln(n) - sum(c ln c)/n computed directly,
    to the 6-decimal rounding the query pins."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("entropy")
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_uniq"], r["h_nats"])
        for r in catalog.queries()["x_word_entropy_quality"](spark, str(tmp)).collect()
    }
    for i, words in enumerate(docs):
        cnt = Counter(w for w in " ".join(words).strip().split() if w)
        n = sum(cnt.values())
        h = round(math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n, 6)
        assert got[i] == (n, len(cnt), h), (i, docs, got[i])


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30),
        min_size=2,
        max_size=8,
    ),
    data=st.data(),
)
@_SETTINGS
def test_exact_substring_pairs_match_python_model(spark, docs, data, tmp_path_factory):
    """x_dedup_exact_substring == a direct model: pairs sharing >=1
    distinct 8-word window whose corpus df <= 20, with shared-window
    counts — including PLANTED duplication (one doc's window copied
    into another), which the random tail alone would almost never hit."""
    from collections import Counter, defaultdict

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    K = 8
    words_per_doc = [list(d) for d in docs]
    # plant: copy an 8-word run from doc 0 into doc 1 when doc 0 is long enough
    if len(words_per_doc[0]) >= K:
        start = data.draw(st.integers(0, len(words_per_doc[0]) - K))
        words_per_doc[1] = words_per_doc[1] + words_per_doc[0][start : start + K]

    tmp = tmp_path_factory.mktemp("substr")
    rows = [(i, " ".join(ws)) for i, ws in enumerate(words_per_doc)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    windows = {
        i: {" ".join(ws[j : j + K]) for j in range(len(ws) - K + 1)}
        for i, ws in enumerate(words_per_doc)
    }
    df_ct = Counter(w for wins in windows.values() for w in wins)
    kept = {w for w, c in df_ct.items() if c <= 20}
    model = defaultdict(int)
    ids = sorted(windows)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            shared = (windows[ids[ai]] & windows[ids[bi]]) & kept
            if shared:
                model[(ids[ai], ids[bi])] = len(shared)

    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in catalog.queries()["x_dedup_exact_substring"](spark, str(tmp)).collect()
    }
    assert got == dict(model), (words_per_doc, got, dict(model))


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30),
        min_size=2,
        max_size=8,
    ),
    data=st.data(),
)
@_SETTINGS
def test_duplicate_span_fraction_matches_python_model(
    spark, docs, data, tmp_path_factory
):
    """x_duplicate_span_fraction == a direct model: per doc, the share
    of its distinct 8-word windows whose corpus df >= 2, integer-ppm
    floor — with PLANTED duplication (an 8-word run copied from doc 0
    into doc 1), since random 30-word tails almost never collide, and
    <8-word docs pinned to (0, 0, 0) rows."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    K = 8
    words_per_doc = [list(d) for d in docs]
    if len(words_per_doc[0]) >= K:
        start = data.draw(st.integers(0, len(words_per_doc[0]) - K))
        words_per_doc[1] = words_per_doc[1] + words_per_doc[0][start : start + K]

    tmp = tmp_path_factory.mktemp("spanfrac")
    rows = [(i, " ".join(ws)) for i, ws in enumerate(words_per_doc)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    windows = {
        i: {" ".join(ws[j : j + K]) for j in range(len(ws) - K + 1)}
        for i, ws in enumerate(words_per_doc)
    }
    df_ct = Counter(w for wins in windows.values() for w in wins)
    model = {}
    for i, wins in windows.items():
        n = len(wins)
        dup = sum(1 for w in wins if df_ct[w] >= 2)
        model[i] = (n, dup, dup * 1_000_000 // n if n else 0)

    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ppm"])
        for r in catalog.queries()["x_duplicate_span_fraction"](
            spark, str(tmp)
        ).collect()
    }
    assert got == model, (words_per_doc, got, model)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
        min_size=2,
        max_size=6,
    )
)
@_SETTINGS
def test_dedup_survivors_match_python_model(spark, docs, tmp_path_factory):
    """x_dedup_survivors == a direct Python model of the WHOLE chain:
    md5 MinHash signatures (8 seeds, 3-word shingles, 'z'*32 empty
    sentinel), 4×2 banded LSH candidates, >=0.5 signature-match verify,
    min-label connected components, frozen-logit argmax with
    doc_id-ascending tie-break. Doc 1 is planted as an EXACT duplicate
    of doc 0 so a non-singleton cluster always exists (tie on logit →
    the tie-break decides the survivor)."""
    import hashlib
    from collections import defaultdict

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import (
        text as T,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    words_per_doc = [list(d) for d in docs]
    words_per_doc[1] = list(words_per_doc[0])

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    sigs = {}
    for i, ws in enumerate(words_per_doc):
        sh = [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        sigs[i] = [
            min((md5(f"{j}:{s}") for s in sh), default="z" * 32) for j in range(8)
        ]

    buckets = defaultdict(set)
    for i, sig in sigs.items():
        for b in range(4):
            buckets[(b, md5("|".join(sig[2 * b : 2 * b + 2])))].add(i)
    cand = {
        (a, b)
        for ids in buckets.values()
        for a in ids
        for b in ids
        if a < b
    }
    pairs = [
        (a, b)
        for a, b in cand
        if sum(sigs[a][p] == sigs[b][p] for p in range(8)) / 8.0 >= 0.5
    ]

    parent = {i: i for i in range(len(words_per_doc))}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(list)
    for i in range(len(words_per_doc)):
        comp[find(i)].append(i)

    stops = {s.lower() for s in T.LANG_STOPWORDS["en"]}

    def logit(ws: list) -> float:
        text = " ".join(ws)
        toks = [w for w in text.strip().split() if w]
        nt = max(len(toks), 1)
        n_stop = sum(1 for w in toks if w.lower() in stops)
        return (
            -1.2
            + 3.0 * (n_stop / nt)
            + 1.6 * (len(set(toks)) / nt)
            + -0.02 * abs(len(text.strip()) / nt - 6.0)
        )

    model = {}
    for root, members in comp.items():
        best = min(members, key=lambda i: (-logit(words_per_doc[i]), i))
        model[root] = (best, len(members), len(members) - 1)

    tmp = tmp_path_factory.mktemp("survivors")
    rows = [(i, " ".join(ws)) for i, ws in enumerate(words_per_doc)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    got = {}
    for r in catalog.queries()["x_dedup_survivors"](spark, str(tmp)).collect():
        got[r["cluster_id"]] = (
            r["survivor_doc_id"],
            r["cluster_size"],
            r["n_removed"],
        )
        assert (
            abs(r["survivor_logit"] - logit(words_per_doc[r["survivor_doc_id"]]))
            < 1e-6
        ), (r, words_per_doc)
    assert got == model, (words_per_doc, got, model)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
        min_size=2,
        max_size=6,
    ),
    ids=st.lists(st.integers(0, 5000), min_size=6, max_size=6, unique=True),
)
@_SETTINGS
def test_split_leakage_safe_matches_python_model(spark, docs, ids, tmp_path_factory):
    """x_split_leakage_safe == a direct model: md5 hash split
    ('split:<id>' first two hex < 'e6' → train), LSH near-dup pairs
    (same chain as the survivors model), train docs with a val near-dup
    dropped. Doc ids are DRAWN (not sequential) so the hash split
    explores both sides, and doc 1 is planted as an exact duplicate of
    doc 0 so cross-split near-dup pairs actually occur whenever the
    hash puts the pair on opposite sides."""
    import hashlib
    from collections import defaultdict

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    words_per_doc = [list(d) for d in docs]
    words_per_doc[1] = list(words_per_doc[0])
    doc_ids = ids[: len(words_per_doc)]

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    def split_of(i: int) -> str:
        return "train" if md5(f"split:{i}")[:2] < "e6" else "val"

    sigs = {}
    for i, ws in zip(doc_ids, words_per_doc):
        sh = [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        sigs[i] = [
            min((md5(f"{j}:{s}") for s in sh), default="z" * 32) for j in range(8)
        ]
    buckets = defaultdict(set)
    for i, sig in sigs.items():
        for b in range(4):
            buckets[(b, md5("|".join(sig[2 * b : 2 * b + 2])))].add(i)
    pairs = [
        (a, b)
        for ids_ in buckets.values()
        for a in ids_
        for b in ids_
        if a < b
        and sum(sigs[a][p] == sigs[b][p] for p in range(8)) / 8.0 >= 0.5
    ]
    # dedupe candidate pairs discovered via multiple bands
    pairs = sorted(set(pairs))

    n_val_dups = defaultdict(int)
    for a, b in pairs:
        if split_of(a) == "train" and split_of(b) == "val":
            n_val_dups[a] += 1
        if split_of(b) == "train" and split_of(a) == "val":
            n_val_dups[b] += 1
    model = {
        i: (
            split_of(i),
            n_val_dups[i],
            1 if split_of(i) == "val" or n_val_dups[i] == 0 else 0,
        )
        for i in doc_ids
    }

    tmp = tmp_path_factory.mktemp("leakage")
    rows = [(i, " ".join(ws)) for i, ws in zip(doc_ids, words_per_doc)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    got = {
        r["doc_id"]: (r["split"], r["n_val_dups"], r["kept"])
        for r in catalog.queries()["x_split_leakage_safe"](spark, str(tmp)).collect()
    }
    assert got == model, (doc_ids, words_per_doc, got, model)


def test_split_leakage_safe_agrees_with_split_train_val(spark):
    """The membership single-owner (_split_case_sql / split_assignment)
    is shared with x_split_train_val; this pins the two queries to the
    SAME assignment on real data, so a drifting copy cannot pass
    unnoticed even though each query has its own oracle."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    a = {
        r["doc_id"]: r["split"]
        for r in catalog.queries()["x_split_train_val"](spark, SF_SMOKE).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in catalog.queries()["x_split_leakage_safe"](spark, SF_SMOKE).collect()
    }
    assert a == b


def _py_bpe_model(wf: dict, n_steps: int):
    """Direct BPE trainer model: greedy left-to-right merge application,
    tie-break (count desc, left+SEP+right asc) — the engine contract."""
    return _py_bpe_train(wf, n_steps)[0]


def _py_bpe_train(wf: dict, n_steps: int):
    """As _py_bpe_model, but also returns the final encoded sequences
    (word -> symbol list) — the usage/prune model's input."""
    from collections import Counter

    SEP = "\x01"
    seqs = {w: list(w) for w in wf}
    steps = []
    for k in range(1, n_steps + 1):
        pc = Counter()
        for w, n in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1])
        )
        steps.append((k, a, b, a + b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return steps, seqs


def test_bpe_merge_steps_overlap_semantics(spark):
    """The greedy-overlap contract, pinned on the classic case: 'aaaa'
    merges to [aa, aa] in round 1 (pair count 3, but application is
    left-to-right non-overlapping), then to [aaaa] in round 2, then the
    loop stops early — replace()'s scan order IS BPE's."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bpe import (
        bpe_merge_steps,
    )

    wf = spark.createDataFrame([("aaaa", 1)], "word string, n bigint")
    got = bpe_merge_steps(wf, 5)
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)], got


@given(
    words=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_bpe_merge_steps_matches_python_model(spark, words):
    """bpe_merge_steps == the direct trainer model for every corpus:
    same winners, same counts, same greedy application, same early
    stop."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bpe import (
        bpe_merge_steps,
    )

    query_scope.release()
    try:
        wf = spark.createDataFrame(list(words.items()), "word string, n bigint")
        got = bpe_merge_steps(wf, 4)
        assert got == _py_bpe_model(words, 4), (words, got)
    finally:
        query_scope.release()


def test_bpe_encode_docs_degenerate_corpus_matches_oracle(spark, tmp_path_factory):
    """Self-review regressions: (a) a corpus supporting FEWER than
    _BPE_STEPS merges must not empty the oracle (dried-up winner CTEs
    become no-op replaces), and (b) a document with no qualifying words
    must still emit (doc_id, 0, 0) in both engines."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("bpe_enc_degen")
    # 'ab ab' + 'ab' supports exactly ONE merge (a,b); doc 2 is blank
    rows = [(0, "ab ab"), (1, "ab"), (2, "   ")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    got = sorted(
        tuple(r)
        for r in catalog.queries()["x_bpe_encode_docs"](spark, str(tmp)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(w)
        for w in con.execute(catalog.oracle_sql()["x_bpe_encode_docs"]).fetchall()
    )
    assert got == want == [(0, 2, 2), (1, 1, 1), (2, 0, 0)], (got, want)


def test_wrap_words_handles_newlines_and_drops_sep_words(spark):
    """Standalone-operator contract: every character (newlines included)
    is separator-wrapped — an unwrapped char would silently no-op every
    merge that wins on it — and SEP-containing words are dropped inside
    the operator, not just by the catalog query's word extraction."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bpe import (
        SEP,
        bpe_merge_steps,
        wrap_words,
    )

    wf = spark.createDataFrame(
        [("a\nb", 3), ("x" + SEP + "y", 9)], "word string, n bigint"
    )
    wrapped = [r["str"] for r in wrap_words(wf).collect()]
    assert wrapped == [SEP + "a" + SEP + SEP + "\n" + SEP + SEP + "b" + SEP]
    # and the trainer merges THROUGH the newline symbol like any other
    # (tie on count 3: pair string '\n<SEP>b' sorts before 'a<SEP>\n')
    steps = bpe_merge_steps(wf, 2)
    assert steps == [
        (1, "\n", "b", "\nb", 3),
        (2, "a", "\nb", "a\nb", 3),
    ], steps


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=3),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_lm_bigram_predictability_matches_python_model(
    spark, docs, tmp_path_factory
):
    """x_lm_bigram_predictability == a direct model: Laplace bigram LM
    over the hash-split train half, integer-ppm terms, unseen floor
    1e6//V, per-doc rollup, zero rows for <2-word docs."""
    import hashlib

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("lm")
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def words_of(text):
        return [w.lower() for w in text.strip().split() if w]

    def is_train(doc_id):
        return hashlib.md5(f"lmtrain:{doc_id}".encode()).hexdigest()[:2] < "80"

    from collections import Counter

    uni, big = Counter(), Counter()
    for i, text in rows:
        if is_train(i):
            ws = words_of(text)
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
    v = len(uni)
    want = {}
    for i, text in rows:
        ws = words_of(text)
        bgs = list(zip(ws, ws[1:]))
        total = unseen = 0
        for bg in bgs:
            if bg in big:
                total += (1000000 * (big[bg] + 1)) // (uni[bg[0]] + v)
            else:
                # v == 0 (wordless train half): 1e6 div 0 is NULL in
                # both engines, sum() skips NULLs -> total stays 0 and
                # the mean (NULL div n) is NULL; mirror that here
                total += 1000000 // v if v else 0
                unseen += 1
        n = len(bgs)
        mean = (total // n) if (n and v) else None
        want[i] = (n, total, mean, unseen)

    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["pred_ppm_total"],
            r["pred_ppm_mean"],
            r["n_unseen"],
        )
        for r in catalog.queries()["x_lm_bigram_predictability"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (docs, got, want)


def test_lm_bigram_predictability_empty_train_half(spark, tmp_path_factory):
    """v = 0 edge (second-review finding): a wordless train half makes
    the unseen term 1e6/0 — DuckDB's // yields NULL, but Spark's ANSI
    `div` THROWS unless guarded, so the term is gated on v > 0. Pinned
    here because the fixtures can never reach it: scoring totals
    coalesce to 0, means stay NULL, unseen counts survive."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("lm_v0")
    rows = [(0, ""), (1, " "), (2, ""), (3, "a a")]  # train docs wordless
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in catalog.queries()["x_lm_bigram_predictability"](
            spark, str(tmp)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(w)
        for w in con.execute(
            catalog.oracle_sql()["x_lm_bigram_predictability"]
        ).fetchall()
    )
    assert got == want, (got, want)
    assert got[3] == (3, 1, 0, None, 1)  # bigram counted unseen, NULL mean


def test_bpe_encode_docs_wraps_unicode_line_separators(spark, tmp_path_factory):
    """Second-review finding: Java's '.' without DOTALL skips Unicode
    line terminators (U+2028 etc.) that survive the \\s+ split, leaving
    them unwrapped at ENCODE time while the train side and the DuckDB
    oracle wrap them — merges trained through such a char would
    silently no-op and n_bpe_tokens diverge. Pinned with a corpus whose
    hottest pair spans U+2028."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("bpe_u2028")
    w = "a\u2028b"
    rows = [(0, f"{w} {w} {w}"), (1, w)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in catalog.queries()["x_bpe_encode_docs"](spark, str(tmp)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(catalog.oracle_sql()["x_bpe_encode_docs"]).fetchall()
    )
    assert got == want, (got, want)
    # with 6 merge rounds the 3-char word fully fuses: 1 symbol per word
    assert got == [(0, 3, 3), (1, 1, 1)], got


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.text(alphabet="abcd", min_size=1, max_size=3),
                min_size=0,
                max_size=8,
            ),
            st.sampled_from(["en", "de", "zh"]),
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_dsir_hashed_importance_matches_python_model(
    spark, docs, tmp_path_factory
):
    """x_dsir_hashed_importance == a direct model: md5-hashed unigram
    buckets, Laplace ppm likelihood ratio per bucket (target = 'en'
    docs, raw = all docs), per-doc sum/mean, zero-token docs emit
    (0, 0, NULL)."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("dsir")
    rows = [(i, " ".join(ws), lang) for i, (ws, lang) in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 256

    ct, cr = Counter(), Counter()
    for _, text, lang in rows:
        for w in text.strip().lower().split():
            if not w:
                continue
            b = bucket(w)
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    r = {b: (1000000 * (ct[b] + 1)) // (cr[b] + 1) for b in cr}
    want = {}
    for i, text, lang in rows:
        ws = [w for w in text.strip().lower().split() if w]
        total = sum(r[bucket(w)] for w in ws)
        n = len(ws)
        want[i] = (lang == "en", n, total, total // n if n else None)

    got = {
        row["doc_id"]: (
            row["is_target"],
            row["n_tokens"],
            row["lr_ppm_total"],
            row["lr_ppm_mean"],
        )
        for row in catalog.queries()["x_dsir_hashed_importance"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (docs, got, want)


@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=12
    )
)
@_SETTINGS
def test_mixture_apportion_matches_hamilton_model(
    spark, weights, tmp_path_factory
):
    """x_mixture_apportion_budget == the largest-remainder method: base
    floor quotas, +1 to the top remainders (ties by source name), and
    the final quotas sum EXACTLY to the budget whenever total weight is
    positive (all-zero weights apportion nothing)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    T = 1_000_000
    tmp = tmp_path_factory.mktemp("apportion")
    # one doc per (source, weight); sources named so string order is
    # deterministic across engines
    rows = [(i, f"s{i:02d}", w) for i, w in enumerate(weights)]
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    n = sum(weights)
    if n > 0:
        base = {f"s{i:02d}": (T * w) // n for i, w in enumerate(weights)}
        rem = {f"s{i:02d}": (T * w) % n for i, w in enumerate(weights)}
        leftover = T - sum(base.values())
        order = sorted(base, key=lambda s: (-rem[s], s))
        extra = {s: (1 if k < leftover else 0) for k, s in enumerate(order)}
    else:
        base = {f"s{i:02d}": 0 for i in range(len(weights))}
        extra = {s: 0 for s in base}
    want = {s: (base[s], extra[s], base[s] + extra[s]) for s in base}

    got = {
        r["source"]: (r["base_quota"], r["extra"], r["final_quota"])
        for r in catalog.queries()["x_mixture_apportion_budget"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (weights, got, want)
    if n > 0:
        assert sum(q for _, _, q in got.values()) == T


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.text(alphabet="abct ", min_size=1, max_size=4).map(str.strip),
                min_size=0,
                max_size=6,
            ),
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_quality_threshold_by_source_matches_python_model(
    spark, docs, tmp_path_factory
):
    """x_quality_threshold_by_source == a direct model: the frozen
    logit (same IEEE op order as the query, so Python doubles match
    Spark doubles bit-for-bit), floor-quantized to ten-thousandths,
    per-source p75 = value at ceil(0.75*N) ascending, ties at the
    threshold all selected."""
    import math

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.text import (
        LANG_STOPWORDS,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("qthr")
    rows = [(i, " ".join(ws), src) for i, (ws, src) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    stops = set(LANG_STOPWORDS["en"])

    def bucket(text):
        ws = [w for w in text.strip().split() if w]
        nt = len(ws)
        ns = sum(1 for w in ws if w.lower() in stops)
        nu = len(set(ws))
        nc = len(text.strip())
        d = float(max(nt, 1))
        logit = (
            -1.2 + 3.0 * (ns / d) + 1.6 * (nu / d) + -0.02 * abs(nc / d - 6.0)
        )
        return math.floor(logit * 10000)

    per_source = {}
    for i, text, src in rows:
        per_source.setdefault(src, []).append(bucket(text))
    thr = {}
    for src, bs in per_source.items():
        pos = (3 * len(bs) + 3) // 4  # ceil(0.75*N), 1-based
        thr[src] = sorted(bs)[pos - 1]
    want = {
        i: (src, bucket(text), thr[src], bucket(text) >= thr[src])
        for i, text, src in rows
    }

    got = {
        r["doc_id"]: (
            r["source"],
            r["quality_bucket"],
            r["p75_bucket"],
            r["selected"],
        )
        for r in catalog.queries()["x_quality_threshold_by_source"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (docs, got, want)


_GOPHER_POOL = (
    "the", "be", "to", "of", "and", "that", "have", "with",
    "spark", "scan", "a1", "1234", "##", "...", "....", "#x#",
    "zzzzzzzzzzzzzzzz", "q",
)


def _gopher_model(text: str):
    import re as _re

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.text import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    t = text.strip()
    wl = [] if t == "" else _re.split(r"\s+", t.lower())
    n_tok = len(wl)
    n_wchars = len(_re.sub(r"\s+", "", t))
    n_sym = len(_re.findall(r"#|\.\.\.", text))
    n_alpha = sum(1 for w in wl if _re.search(r"[a-z]", w))
    n_stop = sum(1 for w in wl if w in GOPHER_STOPWORDS)
    rules = (
        GOPHER_MIN_WORDS <= n_tok <= GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN * n_tok <= n_wchars <= GOPHER_MAX_MEAN_WORD_LEN * n_tok,
        n_sym * 10 <= n_tok,
        n_alpha * 5 >= n_tok * 4,
        n_stop >= 2,
    )
    return (n_tok, *rules, all(rules))


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_GOPHER_POOL), min_size=0, max_size=60),
        min_size=1,
        max_size=5,
    ),
    seps=st.lists(
        st.sampled_from([" ", "  ", " \t ", "\t"]), min_size=1, max_size=5
    ),
)
@_SETTINGS
def test_gopher_rules_matches_python_model(spark, docs, seps, tmp_path_factory):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    # vary the inter-word whitespace per doc: the \s+ tokenization and
    # the n_wchars strip must agree with the model beyond single spaces
    texts = [seps[i % len(seps)].join(ws) for i, ws in enumerate(docs)]
    tmp = tmp_path_factory.mktemp("gopher")
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = {
        r["doc_id"]: (
            r["n_words"],
            r["rule_word_count"],
            r["rule_mean_word_len"],
            r["rule_symbol_ratio"],
            r["rule_alpha_words"],
            r["rule_stopwords"],
            r["keep"],
        )
        for r in catalog.queries()["x_quality_gopher_rules"](
            spark, str(tmp)
        ).collect()
    }
    want = {i: _gopher_model(t) for i, t in enumerate(texts)}
    assert got == want, (texts, got, want)


def _pmi_model(word_docs: list[list[str]]):
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_ext import (
        _PMI_V,
    )

    dsets = [sorted(set(ws)) for ws in word_docs]
    df = Counter(w for s in dsets for w in s)
    vocab = dict(sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_V])
    n = len(word_docs)
    pairs = Counter()
    for s in dsets:
        f = [w for w in s if w in vocab]
        for i in range(len(f)):
            for j in range(i + 1, len(f)):
                pairs[(f[i], f[j])] += 1
    return {
        (a, b): (c, ((c * 1_000_000 // vocab[a]) * n) // vocab[b])
        for (a, b), c in pairs.items()
    }


def _run_pmi(spark, word_docs, tmp):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_docs)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    return {
        (r["w1"], r["w2"]): (r["n_docs_both"], r["lift_ppm"])
        for r in catalog.queries()["x_word_pmi_pairs"](spark, str(tmp)).collect()
    }


@given(
    docs=st.lists(
        st.lists(st.text(alphabet="abcdefghij", min_size=1, max_size=2), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_word_pmi_pairs_matches_python_model(spark, docs, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pmi")
    assert _run_pmi(spark, docs, tmp) == _pmi_model(docs), docs


def test_word_pmi_pairs_vocab_cap_and_tiebreak(spark, tmp_path_factory):
    """>V distinct words: the top-V cap must bind with the (df DESC,
    word ASC) tie-break, and no excluded word may reach the pair grain
    — the property that bounds the output at C(V,2) for ANY corpus."""
    ws = [f"w{i:02d}" for i in range(80)]
    docs = [["aa"] + ws[:40], ["aa"] + ws[40:], ["aa", "w00"]]
    got = _run_pmi(spark, docs, tmp_path_factory.mktemp("pmicap"))
    model = _pmi_model(docs)
    assert got == model
    # vocab = aa(df 3), w00(df 2), then w01..w62 by the name tie-break
    seen = {w for p in got for w in p}
    assert "w62" in seen and "w63" not in seen and "w79" not in seen, sorted(seen)


def _pagerank_model(pairs: list[tuple[int, int]]):
    from collections import Counter, defaultdict

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.dedup import (
        PR_BASE_PPM,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_INIT_PPM,
    )

    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = Counter(u for u, _ in edges)
    r = {u: PR_INIT_PPM for u in deg}
    for _ in range(3):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += ((r[u] * PR_DAMP_NUM) // PR_DAMP_DEN) // deg[u]
        r = {u: PR_BASE_PPM + s[u] for u in deg}
    return {u: (r[u], deg[u]) for u in deg}


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_integer_pagerank_matches_python_model(spark, pairs):
    """The distributed iteration must equal the single-threaded integer
    model on arbitrary multigraphs — partitioning and join order cannot
    change a result defined as a pure integer function of the edges."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.dedup import (
        integer_pagerank,
    )

    pairs = [(a, b) for a, b in pairs if a != b]  # LSH pairs have id_a < id_b
    df = spark.createDataFrame(pairs or [], "id_a long, id_b long").repartition(3)
    got = {
        r["u"]: (r["pagerank_ppm"], r["deg"])
        for r in integer_pagerank(df, iterations=3).collect()
    }
    assert got == _pagerank_model(pairs), (pairs, got)


def test_sample_uniform_k_matches_python_model(spark, tmp_path_factory):
    """Exact-k uniform sample = the k smallest keyed-md5 values; the
    engine must pick exactly the model's id set in the model's order."""
    import hashlib

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_scale import (
        _UNIFORM_K,
    )

    ids = list(range(3000))
    tmp = tmp_path_factory.mktemp("usample")
    spark.createDataFrame(
        [(i, "t") for i in ids], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = [
        (r["doc_id"], r["sort_key"])
        for r in catalog.queries()["x_sample_uniform_k"](spark, str(tmp))
        .orderBy("sort_key", "doc_id")
        .collect()
    ]
    keyed = sorted(
        (hashlib.md5(f"usample:{i}".encode()).hexdigest(), i) for i in ids
    )
    want = [(i, h) for h, i in keyed[:_UNIFORM_K]]
    assert len(got) == _UNIFORM_K and got == want


def test_retrieval_mrr_matches_python_model(spark, tmp_path_factory):
    """End-to-end MRR semantics on a hand-built corpus whose cosine
    gaps are orders of magnitude wider than the round(6) grid, so the
    float model's RANKING is unambiguous and the integer MRR is exact:
    first same-label neighbor rank → 1e6 div rank; no hit → (0, 0)."""
    import math

    rows = [
        # queries (vec_id < 5)
        (0, [1.0, 0.0, 0.0], 1),
        (1, [0.0, 0.0, 1.0], 9),  # label 9 exists nowhere else -> no hit
        # corpus
        (10, [0.9, 0.1, 0.0], 2),  # q0 rank 1, wrong label
        (11, [0.8, 0.2, 0.0], 1),  # q0 rank 2, match -> mrr 500000
        (12, [0.5, 0.5, 0.0], 1),
        (13, [0.1, 0.9, 0.0], 2),
        (14, [0.0, 1.0, 0.0], 2),
    ]
    tmp = tmp_path_factory.mktemp("mrr")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    want = {}
    by_id = {i: (v, lab) for i, v, lab in rows}
    for qid in (0, 1):
        qv, ql = by_id[qid]
        ranked = sorted(
            ((cos(qv, v), -i) for i, (v, lab) in by_id.items() if i != qid),
            reverse=True,
        )
        first = 0
        for rank, (_, negi) in enumerate(ranked[:10], start=1):
            if by_id[-negi][1] == ql:
                first = rank
                break
        want[qid] = (first, 1_000_000 // first if first else 0)

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        r["query_id"]: (r["first_rank"], r["mrr_ppm"])
        for r in catalog.queries()["x_retrieval_mrr"](spark, str(tmp)).collect()
    }
    assert got == want, (got, want)


def test_ann_pq_topk_matches_python_model(spark, tmp_path_factory):
    """Full-chain PQ semantics against a direct python model: md5
    codebook sampling → per-subspace argmin encode (lowest-code ties)
    → ADC table-lookup sums → (adc, neighbor) ranking. Vector values
    are k/64 binary fractions, exact in float32 AND float64, so the
    python fold reproduces the engines' doubles bit-for-bit and the
    round(6) boundary can never be a half-way case."""
    import hashlib

    def vec(i):
        return [((i * 17 + d * 5 + (i * d) % 7) % 64) / 64 for d in range(64)]

    ids = list(range(20))
    rows = [(i, vec(i)) for i in ids]
    tmp = tmp_path_factory.mktemp("pq")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp / "embeddings.parquet"))

    book_ids = sorted(
        ids, key=lambda i: hashlib.md5(f"pq:{i}".encode()).hexdigest()
    )[:16]
    book = [vec(i) for i in book_ids]

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    def sub(v, s):
        return v[s * 16 : (s + 1) * 16]

    codes = {
        i: [
            min((sq(sub(vec(i), s), sub(c, s)), j + 1) for j, c in enumerate(book))[1]
            for s in range(4)
        ]
        for i in ids
    }
    want = {}
    for q in range(5):
        dtab = [[sq(sub(vec(q), s), sub(c, s)) for c in book] for s in range(4)]
        scored = []
        for n in ids:
            if n == q:
                continue
            adc = dtab[0][codes[n][0] - 1]
            for s in range(1, 4):
                adc = adc + dtab[s][codes[n][s] - 1]
            scored.append((round(adc, 6), n))
        for rank, (adc, n) in enumerate(sorted(scored)[:10], start=1):
            want[(q, n)] = (adc, rank)

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_dist"], r["rank"])
        for r in catalog.queries()["x_ann_pq_topk"](spark, str(tmp)).collect()
    }
    assert got == want, (got, want)


def test_ann_pq_recall_consistent_with_both_topk_queries(spark):
    """The recall cells must be recomputable from x_ann_cosine_topk's
    and x_ann_pq_topk's own outputs — pins the evaluation to the SAME
    ranking owners (S.cosine_topk/_ANN_TOPK_CTES; S.pq_topk/_PQ_CTES)
    on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    truth, approx = {}, {}
    for r in catalog.queries()["x_ann_cosine_topk"](spark, SF_SMOKE).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in catalog.queries()["x_ann_pq_topk"](spark, SF_SMOKE).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    want = {
        q: (len(t), len(t & approx.get(q, set())),
            len(t & approx.get(q, set())) * 100 // len(t))
        for q, t in truth.items()
    }
    got = {
        r["query_id"]: (r["n_truth"], r["n_matched"], r["recall_pct"])
        for r in catalog.queries()["x_ann_pq_recall"](spark, SF_SMOKE).collect()
    }
    assert got == want, (got, want)


def test_retrieval_ndcg_matches_python_model(spark, tmp_path_factory):
    """End-to-end NDCG@10 semantics on the MRR test's wide-gap corpus
    (ranking unambiguous at round(6)), with the gain table recomputed
    here from math.log2 — so a drift in the _NDCG_W/_NDCG_IDCG owner
    values themselves fails this test, not just engine/oracle skew."""
    import math

    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]
    idcg = [sum(w[: n + 1]) for n in range(10)]

    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (1, [0.0, 0.0, 1.0], 9),  # label 9 unique -> n_rel 0 -> zeros
        (10, [0.9, 0.1, 0.0], 2),  # q0 rank 1, wrong label
        (11, [0.8, 0.2, 0.0], 1),  # q0 rank 2, relevant
        (12, [0.5, 0.5, 0.0], 1),  # q0 rank 3, relevant
        (13, [0.1, 0.9, 0.0], 2),
        (14, [0.0, 1.0, 0.0], 2),
    ]
    tmp = tmp_path_factory.mktemp("ndcg")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    by_id = {i: (v, lab) for i, v, lab in rows}
    want = {}
    for qid in (0, 1):
        qv, ql = by_id[qid]
        ranked = sorted(
            ((cos(qv, v), -i) for i, (v, lab) in by_id.items() if i != qid),
            reverse=True,
        )
        dcg = sum(
            w[rank - 1]
            for rank, (_, negi) in enumerate(ranked[:10], start=1)
            if by_id[-negi][1] == ql
        )
        n_rel = min(sum(1 for i, (_, lab) in by_id.items() if lab == ql) - 1, 10)
        want[qid] = (
            n_rel,
            dcg,
            dcg * 1_000_000 // idcg[n_rel - 1] if n_rel else 0,
        )

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        r["query_id"]: (r["n_rel"], r["dcg_ppm"], r["ndcg_ppm"])
        for r in catalog.queries()["x_retrieval_ndcg"](spark, str(tmp)).collect()
    }
    assert got == want, (got, want)


def test_retrieval_ndcg_consistent_with_cosine_topk(spark):
    """The NDCG cells must be recomputable from x_ann_cosine_topk's own
    output plus the raw labels — pins this query to the SAME ranking
    owner (S.cosine_topk / _ANN_TOPK_CTES) on real data."""
    import math

    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]
    idcg = [sum(w[: n + 1]) for n in range(10)]
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    topk = catalog.queries()["x_ann_cosine_topk"](spark, SF_SMOKE).collect()
    want = {}
    for qid in (q for q in labels if q < 5):
        ql = labels[qid]
        dcg = sum(
            w[r["rank"] - 1]
            for r in topk
            if r["query_id"] == qid and labels[r["neighbor_id"]] == ql
        )
        n_rel = min(sum(1 for v, lab in labels.items() if lab == ql and v != qid), 10)
        want[qid] = (n_rel, dcg, dcg * 1_000_000 // idcg[n_rel - 1] if n_rel else 0)
    got = {
        r["query_id"]: (r["n_rel"], r["dcg_ppm"], r["ndcg_ppm"])
        for r in catalog.queries()["x_retrieval_ndcg"](spark, SF_SMOKE).collect()
    }
    assert got == want, (got, want)


def test_pagerank_nodes_equal_multi_member_cluster_docs(spark):
    """PageRank nodes and connected-components clusters both derive
    from the SAME verified-pair owners (lsh_candidate_pairs /
    _EDGES_CTE): the PageRank node set must be exactly the docs whose
    cluster has ≥2 members. A drift in either query's pair semantics
    breaks this even though each query passes its own oracle."""
    from collections import Counter

    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in catalog.queries()["x_dedup_clusters"](spark, SF_SMOKE).collect()
    }
    sizes = Counter(labels.values())
    clustered = {d for d, c in labels.items() if sizes[c] >= 2}
    nodes = {
        r["doc_id"]
        for r in catalog.queries()["x_pagerank_dup_graph"](spark, SF_SMOKE).collect()
    }
    assert nodes == clustered, (sorted(nodes ^ clustered),)


def test_retrieval_mrr_consistent_with_cosine_topk(spark):
    """MRR must be recomputable from x_ann_cosine_topk's own output +
    labels — pins the two queries to the SAME ranking (shared
    S.cosine_topk / _ANN_TOPK_CTES owners) on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.tables import (
        load_table,
    )

    lab = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    first = {}
    for r in (
        catalog.queries()["x_ann_cosine_topk"](spark, SF_SMOKE)
        .orderBy("query_id", "rank")
        .collect()
    ):
        q, n = r["query_id"], r["neighbor_id"]
        if q not in first and lab[n] == lab[q]:
            first[q] = r["rank"]
    got = {
        r["query_id"]: (r["first_rank"], r["mrr_ppm"])
        for r in catalog.queries()["x_retrieval_mrr"](spark, SF_SMOKE).collect()
    }
    want = {
        q: (first.get(q, 0), 1_000_000 // first[q] if q in first else 0)
        for q in got
    }
    assert got == want, (got, want)


def test_gopher_n_words_consistent_with_text_stats(spark):
    """Both queries tokenize through the ONE words() owner; their token
    counts must agree doc-for-doc on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    a = {
        r["doc_id"]: r["n_words"]
        for r in catalog.queries()["x_quality_gopher_rules"](spark, SF_SMOKE).collect()
    }
    b = {
        r["doc_id"]: r["n_tokens"]
        for r in catalog.queries()["x_text_stats"](spark, SF_SMOKE).collect()
    }
    assert a == b


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abXY.", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_bpe_vocab_usage_matches_python_model(spark, docs, tmp_path_factory):
    """x_bpe_vocab_usage == train via the direct model, encode the
    vocab with the model's final sequences, count surviving merged
    symbols weighted by word frequency; absorbed merges emit 0."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    texts = [" ".join(ws) for ws in docs]
    wf = Counter(w.lower() for ws in docs for w in ws if w)
    steps, seqs = _py_bpe_train(dict(wf), 6)
    merged = sorted({m for _, _, _, m, _ in steps})
    want = {m: 0 for m in merged}
    for w, n in wf.items():
        for sym in seqs[w]:
            if sym in want:
                want[sym] += n

    tmp = tmp_path_factory.mktemp("bpeusage")
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        r["merged_sym"]: r["n_uses"]
        for r in catalog.queries()["x_bpe_vocab_usage"](spark, str(tmp)).collect()
    }
    assert got == want, (texts, got, want)


def test_signal_agreement_consistent_with_both_gates(spark):
    """The agreement cells must be recomputable from the two gate
    queries' own outputs — pins this query to the SAME single owners
    (classifier logit chain; gopher rule battery) on real data."""
    from collections import Counter

    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    clf = {
        r["doc_id"]: r["keep"]
        for r in catalog.queries()["x_quality_classifier_score"](
            spark, SF_SMOKE
        ).collect()
    }
    gop = {
        r["doc_id"]: r["keep"]
        for r in catalog.queries()["x_quality_gopher_rules"](spark, SF_SMOKE).collect()
    }
    want = Counter((clf[d], gop[d]) for d in clf)
    got = {
        (r["clf_keep"], r["gopher_keep"]): r["n_docs"]
        for r in catalog.queries()["x_quality_signal_agreement"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == dict(want), (got, want)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abXY.", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_wordpiece_encode_matches_python_model(spark, docs, tmp_path_factory):
    """x_wordpiece_encode_docs == train via the direct model, then
    greedy longest-match-first munch over {merged symbols} with the
    single-char fallback, summed per doc; the BPE column must equal
    the model's final-sequence lengths (same single-owner chain as
    x_bpe_encode_docs)."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    texts = [" ".join(ws) for ws in docs]
    wf = Counter(w.lower() for ws in docs for w in ws if w)
    steps, seqs = _py_bpe_train(dict(wf), 6)
    vocab = {m for _, _, _, m, _ in steps}

    def munch(word: str) -> int:
        pos, cnt = 0, 0
        while pos < len(word):
            step = 1
            for sym in vocab:
                if len(sym) > step and word.startswith(sym, pos):
                    step = len(sym)
            pos += step
            cnt += 1
        return cnt

    want = {}
    for i, ws in enumerate(docs):
        words = [w.lower() for w in ws if w]
        want[i] = (
            len(words),
            sum(munch(w) for w in words),
            sum(len(seqs[w]) for w in words),
        )

    tmp = tmp_path_factory.mktemp("wp")
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_bpe_tokens"])
        for r in catalog.queries()["x_wordpiece_encode_docs"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (texts, got, want)


def test_wordpiece_bpe_column_consistent_with_encode_query(spark):
    """The n_bpe_tokens column must be bit-identical to
    x_bpe_encode_docs — both sides of the inference-agreement report
    come from the tier's single-owner encode chain on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    enc = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in catalog.queries()["x_bpe_encode_docs"](spark, SF_SMOKE).collect()
    }
    wp = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in catalog.queries()["x_wordpiece_encode_docs"](
            spark, SF_SMOKE
        ).collect()
    }
    assert wp == enc


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abXY.", min_size=1, max_size=6),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_bpe_compression_curve_matches_python_model(spark, docs, tmp_path_factory):
    """x_bpe_compression_curve == re-running the direct python trainer
    to k steps for every k and summing frequency-weighted sequence
    lengths; also pins the structural property that the curve is
    non-increasing in k (a merge can only shrink encodings)."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    texts = [" ".join(ws) for ws in docs]
    wf = Counter(w.lower() for ws in docs for w in ws if w)
    want = {}
    for k in range(7):
        _, seqs = _py_bpe_train(dict(wf), k)
        want[k] = sum(len(seqs[w]) * n for w, n in wf.items())

    tmp = tmp_path_factory.mktemp("bpecurve")
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        r["n_merges"]: r["n_tokens"]
        for r in catalog.queries()["x_bpe_compression_curve"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (texts, got, want)
    vals = [got[k] for k in range(7)]
    assert vals == sorted(vals, reverse=True), vals


def test_bpe_curve_endpoints_consistent_with_encode_and_fertility(spark):
    """Curve point k=6 must equal the x_bpe_encode_docs corpus total,
    and k=0 (character baseline) the x_bpe_fertility_by_lang character
    total — all three queries ride the same single-owner encode chain
    on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    curve = {
        r["n_merges"]: r["n_tokens"]
        for r in catalog.queries()["x_bpe_compression_curve"](
            spark, SF_SMOKE
        ).collect()
    }
    enc_total = sum(
        r["n_bpe_tokens"]
        for r in catalog.queries()["x_bpe_encode_docs"](spark, SF_SMOKE).collect()
    )
    fert = catalog.queries()["x_bpe_fertility_by_lang"](spark, SF_SMOKE).collect()
    char_total = sum(r["n_word_chars"] for r in fert)
    assert curve[6] == enc_total, (curve, enc_total)
    assert curve[0] == char_total, (curve, char_total)


def test_ann_matryoshka_recall_matches_python_model(spark, tmp_path_factory):
    """End-to-end truncation-recall semantics on a corpus whose prefix
    (first 16 dims) and suffix affinities are decorrelated, so the
    16-dim ranking genuinely differs from the 64-dim truth. Vector
    components are k/16 binary fractions (exact in float32 AND
    float64) and the python model folds dots in the same sequential
    order as the engines, so cosines match bit-for-bit; the model also
    asserts every adjacent rounded-cos gap is wide (> 2e-6), so the
    round(6) ranking is unambiguous."""
    rows = []
    # queries: 0 = prefix-heavy, 1 = suffix-heavy
    for qid, (p, s) in enumerate([(1.0, 0.0625), (0.0625, 1.0)]):
        v = [0.0] * 64
        v[0], v[1], v[16] = p, 0.25, s
        rows.append((qid, v))
    for t in range(16):  # corpus 10..25, decorrelated affinities
        v = [0.0] * 64
        v[0] = ((t * 7) % 16 + 1) / 16  # prefix affinity
        v[1] = 0.25
        v[16] = (t + 1) / 16  # suffix affinity
        rows.append((10 + t, v))
    tmp = tmp_path_factory.mktemp("mrl")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp / "embeddings.parquet"))

    import math

    by_id = dict(rows)

    def cos(a, b, dim):
        d = n1 = n2 = 0.0
        for i in range(dim):
            d += a[i] * b[i]
            n1 += a[i] * a[i]
            n2 += b[i] * b[i]
        return round(d / (math.sqrt(n1) * math.sqrt(n2)), 6)

    def topk(qid, dim):
        scored = sorted(
            ((-cos(by_id[qid], v, dim), i) for i, v in by_id.items() if i != qid)
        )
        gaps = [abs(a[0] - b[0]) for a, b in zip(scored, scored[1:])]
        # every gap is either wide (round(6) unambiguous) or an EXACT
        # double tie — which both engines and this model break the same
        # way, by neighbor_id ascending
        assert all(g > 2e-6 or g == 0 for g in gaps)
        return [i for _, i in scored[:10]]

    want = {}
    for qid in (0, 1):
        truth, approx = set(topk(qid, 64)), set(topk(qid, 16))
        want[qid] = (len(truth), len(truth & approx),
                     len(truth & approx) * 100 // len(truth))
    # the construction must make truncation actually lossy
    assert any(cells[2] < 100 for cells in want.values()), want

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        r["query_id"]: (r["n_truth"], r["n_matched"], r["recall_pct"])
        for r in catalog.queries()["x_ann_matryoshka_recall"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (got, want)


def test_ann_matryoshka_recall_consistent_with_both_topk_queries(spark):
    """The recall cells must be recomputable from x_ann_cosine_topk's
    and x_ann_matryoshka_topk's own outputs — pins the evaluation to
    the SAME ranking owners (S.cosine_topk/_ANN_TOPK_CTES; the
    _mrl_trunc prefix/_MRL_TOPK_CTES) on real data."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    truth, approx = {}, {}
    for r in catalog.queries()["x_ann_cosine_topk"](spark, SF_SMOKE).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in catalog.queries()["x_ann_matryoshka_topk"](spark, SF_SMOKE).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    want = {
        q: (len(t), len(t & approx.get(q, set())),
            len(t & approx.get(q, set())) * 100 // len(t))
        for q, t in truth.items()
    }
    got = {
        r["query_id"]: (r["n_truth"], r["n_matched"], r["recall_pct"])
        for r in catalog.queries()["x_ann_matryoshka_recall"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want, (got, want)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    ),
    srcs=st.data(),
)
@_SETTINGS
def test_source_overlap_jaccard_matches_python_model(
    spark, texts, srcs, tmp_path_factory
):
    """x_source_overlap_jaccard == a direct model: per unordered source
    pair, exact Jaccard (ppm floor) of the normalized-fingerprint sets.
    Texts draw from a tiny alphabet so cross-source duplicates (the
    whole point of the matrix) occur constantly; sources are drawn per
    doc from a 3-source pool so some pairs also end up with zero
    overlap, covering the LEFT-join branch."""
    pool = ["s1", "s2", "s3"]
    rows = [
        (i, t, srcs.draw(st.sampled_from(pool), label=f"src{i}"))
        for i, t in enumerate(texts)
    ]
    tmp = tmp_path_factory.mktemp("srcovl")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def norm(t):
        return " ".join(t.lower().split())

    fps = {}
    for _, t, s in rows:
        fps.setdefault(s, set()).add(norm(t))
    present = sorted(fps)
    model = {}
    for ai in range(len(present)):
        for bi in range(ai + 1, len(present)):
            a, b = present[ai], present[bi]
            inter = len(fps[a] & fps[b])
            na, nb = len(fps[a]), len(fps[b])
            model[(a, b)] = (na, nb, inter, inter * 1_000_000 // (na + nb - inter))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_inter"],
            r["jaccard_ppm"],
        )
        for r in catalog.queries()["x_source_overlap_jaccard"](
            spark, str(tmp)
        ).collect()
    }
    assert got == model, (rows, got, model)


def test_ccnet_buckets_consistent_with_lm_query(spark):
    """The bucket cells must be recomputable from
    x_lm_bigram_predictability's own output plus python quartiles
    (1-based ceil(q*N) pick on the sorted non-NULL means, the
    exact_quantile_disc contract) — pins the composition to the SAME
    LM owner on real data and the quartile gates to the documented
    semantics."""
    import math as _m
    from collections import Counter

    import duckdb

    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    scores = {
        r["doc_id"]: (r["pred_ppm_mean"], r["n_bigrams"])
        for r in catalog.queries()["x_lm_bigram_predictability"](
            spark, SF_SMOKE
        ).collect()
    }
    src_of = dict(
        duckdb.connect()
        .execute(
            f"SELECT doc_id, source FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        )
        .fetchall()
    )
    means = {}
    for d, (m, _) in scores.items():
        if m is not None:
            means.setdefault(src_of[d], []).append(m)
    thr = {}
    for s, vs in means.items():
        vs.sort()
        thr[s] = (
            vs[_m.ceil(len(vs) / 4) - 1],
            vs[_m.ceil(3 * len(vs) / 4) - 1],
        )
    want = Counter()
    for d, (m, nb) in scores.items():
        s = src_of[d]
        if m is None:
            b = "short"
        elif m >= thr[s][1]:
            b = "head"
        elif m < thr[s][0]:
            b = "tail"
        else:
            b = "middle"
        n, t = want.get((s, b), (0, 0))
        want[(s, b)] = (n + 1, t + nb)
    got = {
        (r["source"], r["bucket"]): (r["n_docs"], r["n_bigrams_total"])
        for r in catalog.queries()["x_ccnet_perplexity_buckets"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == dict(want), (got, dict(want))


def test_kcenter_diverse_sample_matches_python_model(spark, tmp_path_factory):
    """Full-chain greedy k-center semantics against a direct python
    model. Components are k/64 binary fractions (exact in float32 AND
    float64), so every squared-L2 distance is an exact dyadic m/4096
    that python reproduces bit-for-bit; the model additionally asserts
    no distance is a .5-at-6-decimals halfway case, so round(6)
    agrees across python/Spark/DuckDB rounding modes. Also covers the
    fewer-than-k early stop."""
    import math

    def vec(i):
        return [((i * 13 + d * 3 + (i * d) % 5) % 64) / 64 for d in range(64)]

    def model(ids, k):
        by_id = {i: vec(i) for i in ids}
        sel = [(1, min(ids), None)]
        chosen = {min(ids)}
        while len(sel) < k and len(chosen) < len(ids):
            best = None
            for i in sorted(set(ids) - chosen):
                dmin = min(
                    sum((x - y) * (x - y) for x, y in zip(by_id[i], by_id[j]))
                    for _, j, _ in sel
                )
                # no halfway case at 6 decimals (model self-check)
                assert abs(dmin * 1e6 - math.floor(dmin * 1e6) - 0.5) > 1e-9
                d6 = round(dmin, 6)
                if best is None or d6 > best[0]:
                    best = (d6, i)
            sel.append((len(sel) + 1, best[1], best[0]))
            chosen.add(best[1])
        return sel

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    for tag, ids in (("full", list(range(20))), ("short", [3, 7, 11, 40, 41])):
        tmp = tmp_path_factory.mktemp(f"kc_{tag}")
        spark.createDataFrame(
            [(i, vec(i)) for i in ids], "vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
        got = sorted(
            (r["rank"], r["vec_id"], r["min_dist_sq"])
            for r in catalog.queries()["x_kcenter_diverse_sample"](
                spark, str(tmp)
            ).collect()
        )
        want = model(ids, 8)
        assert got == want, (tag, got, want)
        if tag == "short":
            assert len(got) == len(ids)  # early stop at |corpus|


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60)
)
@_SETTINGS
def test_length_bucket_padding_matches_python_model(
    spark, sizes, tmp_path_factory
):
    """x_length_bucket_padding == a direct model: bucket cap is the
    smallest power of two >= n_chars (cap 1 for n <= 1 — covers the
    n=0 and n=1 edges), padding is capacity minus content, waste is
    ppm floor. Exercises exact powers of two, zeros, and singleton
    buckets."""
    from collections import defaultdict

    tmp = tmp_path_factory.mktemp("lbp")
    rows = [(i, n) for i, n in enumerate(sizes)]
    spark.createDataFrame(rows, "doc_id long, n_chars long").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def cap(n):
        c = 1
        while c < n:
            c <<= 1
        return c

    agg = defaultdict(lambda: [0, 0])
    for _, n in rows:
        a = agg[cap(n)]
        a[0] += 1
        a[1] += n
    want = {
        c: (nd, tc, nd * c - tc, (nd * c - tc) * 1_000_000 // (nd * c))
        for c, (nd, tc) in agg.items()
    }

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        r["bucket_cap"]: (
            r["n_docs"],
            r["total_chars"],
            r["padded_chars"],
            r["waste_ppm"],
        )
        for r in catalog.queries()["x_length_bucket_padding"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (sizes, got, want)


def test_ccnet_buckets_empty_train_vocab_edge(spark, tmp_path_factory):
    """Self-review r5 regression: with a wordless LM train half (every
    doc hash-splits OUT of the 80% lmtrain partition), v = 0 makes
    every scored doc's pred_ppm_mean NULL even though n_bigrams > 0 —
    those docs must bucket 'middle' (NULL threshold comparisons), NOT
    'short'. A Spark-side mean-IS-NULL short test silently diverged
    from the oracle's n_bigrams = 0 here; both engines must agree."""
    import duckdb

    # ids whose md5('lmtrain:'||id) prefix is >= '80' (train half empty)
    ids = [3, 4, 9, 11, 12]
    rows = [(i, "alpha beta gamma", "s1") for i in ids]
    rows.append((13, "solo", "s1"))  # 1 word -> n_bigrams = 0 -> short
    tmp = tmp_path_factory.mktemp("ccnet_edge")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        (r["source"], r["bucket"]): (r["n_docs"], r["n_bigrams_total"])
        for r in catalog.queries()["x_ccnet_perplexity_buckets"](
            spark, str(tmp)
        ).collect()
    }
    want = {("s1", "middle"): (5, 10), ("s1", "short"): (1, 0)}
    assert got == want, got
    # and the oracle agrees on the same corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    oracle = dict()
    for s, b, nd, nb in con.execute(
        catalog.oracle_sql()["x_ccnet_perplexity_buckets"]
    ).fetchall():
        oracle[(s, b)] = (nd, nb)
    assert oracle == want, oracle


def test_source_overlap_jaccard_ignores_null_text(spark, tmp_path_factory):
    """Self-review r5 regression: NULL-text docs carry no content
    fingerprint and must be excluded on BOTH engine sides — before the
    fix Spark's count_distinct skipped the NULL fp while its pair
    branch counted the NULL-fp group as an intersection (denominator
    could even go negative), and the oracle did the opposite."""
    import duckdb

    rows = [
        (0, None, "s1"),
        (1, None, "s2"),  # two all-NULL... plus real content below
        (2, "shared text", "s1"),
        (3, "shared text", "s2"),
        (4, None, "s3"),  # s3 has ONLY null text -> empty fp set
    ]
    tmp = tmp_path_factory.mktemp("srcovl_null")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_inter"],
            r["jaccard_ppm"],
        )
        for r in catalog.queries()["x_source_overlap_jaccard"](
            spark, str(tmp)
        ).collect()
    }
    # s3 contributes no fingerprints, so no s3 pair can exist (its
    # size row is absent after the NULL filter); s1/s2 share their one
    # fingerprint exactly
    want = {("s1", "s2"): (1, 1, 1, 1_000_000)}
    assert got == want, got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    oracle = {
        (a, b): (na, nb, ni, j)
        for a, b, na, nb, ni, j in con.execute(
            catalog.oracle_sql()["x_source_overlap_jaccard"]
        ).fetchall()
    }
    assert oracle == want, oracle


def test_length_bucket_padding_survives_huge_docs(spark, tmp_path_factory):
    """Self-review r5 regression: the bucket cap must shift a BIGINT —
    a 32-bit shiftleft wraps negative for n_chars > 2^30 in Spark
    (DuckDB throws instead). Pin caps across the 2^30..2^44 range.

    ADVICE r5: the waste_ppm product padded·1e6 must not ride BIGINT —
    it overflows at padded > ~9.2e12 (≈ 9 TB in one bucket, reachable
    at the 100 TB design point) while capacity itself is still tiny
    against BIGINT. The 2^44+1 doc below puts padded·1e6 ≈ 1.76e19
    past 2^63−1; both engines must return the exact floor ppm via
    their 128-bit-capable types (DECIMAL(38,0) div / HUGEINT //)."""
    import duckdb

    sizes = [(1 << 30) + 1, (1 << 31) + 5, (1 << 40) - 3, (1 << 44) + 1]
    tmp = tmp_path_factory.mktemp("lbp_huge")
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    def exact(cap, n):
        return (1, cap - n, ((cap - n) * 1000000) // cap)

    got = {
        r["bucket_cap"]: (r["n_docs"], r["padded_chars"], r["waste_ppm"])
        for r in catalog.queries()["x_length_bucket_padding"](
            spark, str(tmp)
        ).collect()
    }
    want = {
        1 << 31: exact(1 << 31, (1 << 30) + 1),
        1 << 32: exact(1 << 32, (1 << 31) + 5),
        1 << 40: exact(1 << 40, (1 << 40) - 3),
        1 << 45: exact(1 << 45, (1 << 44) + 1),
    }
    # sanity: the last bucket's ppm product really exceeds BIGINT, and
    # its exact ppm is NOT a rounding fixed point (floor != round-half-
    # up — the divergence the DuckDB DECIMAL `//` cast would produce),
    # so the test can actually distinguish the two behaviors.
    p, c = want[1 << 45][1] * 1000000, 1 << 45
    assert p > (1 << 63) - 1
    assert p // c != (p + c // 2) // c
    assert got == want, got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    oracle = {
        c: (nd, pc, wp)
        for c, nd, _, pc, wp in con.execute(
            catalog.oracle_sql()["x_length_bucket_padding"]
        ).fetchall()
    }
    assert oracle == want, oracle


def test_contamination_removal_survives_huge_docs(spark, tmp_path_factory):
    """ADVICE r6 regression: chars_lost_ppm's product chars_lost·1e6
    must not ride BIGINT — it overflows once a source loses ~9.2e12
    chars (≈9 TB of text, reachable at the 100 TB design point).
    Two 2^44-char train docs (one flagged via a shared bench 3-gram,
    one clean) put chars_lost·1e6 ≈ 1.76e19 past 2^63−1; both engines
    must return the exact floor ppm via their 128-bit-capable types
    (DECIMAL(38,0) div / HUGEINT //), mirroring
    test_length_bucket_padding_survives_huge_docs."""
    import duckdb

    big = 1 << 44
    rows = [
        # doc_id % 50 == 0 → bench slice (never emitted)
        (0, "alpha beta gamma", "s", 7),
        # shares the bench doc's one 3-gram → flagged
        (1, "alpha beta gamma", "s", big + 1),
        # disjoint grams → clean
        (2, "delta epsilon zeta", "s", big + 3),
    ]
    tmp = tmp_path_factory.mktemp("decon_huge")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    chars_total = 2 * big + 4
    chars_lost = big + 1
    want = {
        "s": (
            2,
            1,
            (1 * 1_000_000) // 2,
            chars_total,
            chars_lost,
            (chars_lost * 1_000_000) // chars_total,
        )
    }
    # sanity: the ppm product really exceeds BIGINT, and the exact ppm
    # is NOT a rounding fixed point (floor != round-half-up — the
    # divergence a DECIMAL `//`-then-CAST would produce in DuckDB), so
    # the test can distinguish the two behaviors.
    p = chars_lost * 1_000_000
    assert p > (1 << 63) - 1
    assert p // chars_total != (p + chars_total // 2) // chars_total

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_removed"],
            r["removed_ppm"],
            r["chars_total"],
            r["chars_lost"],
            r["chars_lost_ppm"],
        )
        for r in catalog.queries()["x_contamination_removal"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    oracle = {
        s: tuple(rest)
        for s, *rest in con.execute(
            catalog.oracle_sql()["x_contamination_removal"]
        ).fetchall()
    }
    assert oracle == want, oracle


def test_embedding_top_component_matches_python_model(spark, tmp_path_factory):
    """Full-chain power-iteration semantics against a direct python
    model. Binary-fraction components (k/16) make ITERATION 1 exact
    dyadic end to end; iterations 2-3 accumulate rounded doubles whose
    cross-row sum order CAN differ between the model and the engines —
    exactly the divergence the e4 snap grid absorbs — so the model
    additionally asserts every per-dim sum sits FAR from a snap
    boundary (margin >> reorder error), turning "happens to agree"
    into a checked precondition. floor(x+0.5) is mode-divergence-free
    even at exact midpoints. Covers the normal path, the
    seed-orthogonal dead corpus (NULL components), and the empty
    corpus (zero rows)."""
    import math

    DIM = 64

    def run(rows, tag, tmp_path_factory=tmp_path_factory):
        tmp = tmp_path_factory.mktemp(f"pi_{tag}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
        from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
            queries as catalog,
        )

        return sorted(
            (
                r["dim"],
                r["comp_e6"],
                r["lambda_e4"],
                r["trace_e4"],
                r["anisotropy_ppm"],
            )
            for r in catalog.queries()["x_embedding_top_component"](
                spark, str(tmp)
            ).collect()
        )

    def model(vecs):
        if not vecs:
            return []
        t_e4 = int(math.floor(sum(x * x for v in vecs for x in v) * 1e4 + 0.5))
        v = [1.0] + [0.0] * (DIM - 1)
        wl = ss = None
        for _ in range(3):
            w = [0.0] * DIM
            for x in vecs:
                s = 0.0
                for i in range(DIM):
                    s += x[i] * v[i]
                for i in range(DIM):
                    w[i] += s * x[i]
            for wi in w:  # snap-boundary margin (see docstring)
                frac = (wi * 1e4 + 0.5) % 1.0
                assert min(frac, 1.0 - frac) > 1e-6, wi
            wl = [int(math.floor(wi * 1e4 + 0.5)) for wi in w]
            ss = sum(x * x for x in wl)
            if ss == 0:
                break
            nrm = math.sqrt(float(ss))
            v = [x / nrm for x in wl]
        if ss == 0:
            return [(i + 1, None, None, t_e4, None) for i in range(DIM)]
        nrm = math.sqrt(float(ss))
        lam = int(math.floor(nrm + 0.5))
        an = int(math.floor(1e6 * nrm / float(t_e4) + 0.5))
        return [
            (i + 1, int(math.floor(wl[i] / nrm * 1e6 + 0.5)), lam, t_e4, an)
            for i in range(DIM)
        ]

    # normal corpus: binary-fraction mixes with a dominant direction
    def vec(i):
        v = [0.0] * DIM
        v[0] = ((i % 5) + 4) / 16
        v[1] = (i % 3) / 16
        v[16] = ((i * 7) % 11) / 16
        return v

    vecs = [vec(i) for i in range(9)]
    got = run(list(enumerate(vecs)), "norm")
    assert got == model(vecs), (got[:3], model(vecs)[:3])
    assert got[0][4] is not None and 0 < got[0][4] <= 1_000_000

    # seed-orthogonal corpus: dim 1 is zero everywhere -> dead at iter 1
    dead = [[0.0] * DIM for _ in range(4)]
    for j, d in enumerate(dead):
        d[5 + j] = 0.5
    got_dead = run(list(enumerate(dead)), "dead")
    assert got_dead == model(dead)
    assert all(r[1] is None and r[4] is None for r in got_dead)

    # empty corpus -> zero rows (matches the oracle's empty final FROM)
    assert run([], "empty") == []


def test_embedding_top_component_skips_null_vectors(spark, tmp_path_factory):
    """Self-review r5 #2: NULL-bearing vectors must be excluded up
    front on BOTH engine sides — the engines' NULL-arithmetic rules
    diverge along the chain (SQL SUM skips NULL inputs; Spark's
    aggregate fold poisons the dot) and the python driver would crash
    squaring a NULL per-dim sum. A corpus with NULL rows/elements must
    give exactly the dense-subset answer in both engines."""
    import duckdb

    def vec(i):
        v = [0.0] * 64
        v[0] = ((i % 5) + 4) / 16
        v[16] = ((i * 7) % 11) / 16
        return v

    rows = [(i, vec(i)) for i in range(6)]
    rows.append((100, None))  # NULL array
    bad = vec(7)
    bad[3] = None  # NULL element
    rows.append((101, bad))
    tmp = tmp_path_factory.mktemp("pi_null")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
    dense = tmp_path_factory.mktemp("pi_dense")
    spark.createDataFrame(
        rows[:6], "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(dense / "embeddings.parquet"))

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    fn = catalog.queries()["x_embedding_top_component"]
    got = sorted(tuple(r) for r in fn(spark, str(tmp)).collect())
    want = sorted(tuple(r) for r in fn(spark, str(dense)).collect())
    assert got == want and len(got) == 64
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{tmp}/embeddings.parquet/*.parquet')"
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            catalog.oracle_sql()["x_embedding_top_component"]
        ).fetchall()
    )
    assert oracle == want, oracle[:3]


@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=14),
        min_size=1,
        max_size=14,
    )
)
@_SETTINGS
def test_vocab_growth_curve_matches_python_model(
    spark, texts, tmp_path_factory
):
    """x_vocab_growth_curve == a direct model: md5-prefix stages
    ('growth:' salt; 40/80/c0 cut points), per-stage doc/token
    cumulative totals, and NEW distinct lowercased words per stage
    (first stage in which the word appears). Also asserts the curve's
    defining property: every cumulative column is non-decreasing and
    stage 4 equals the whole-corpus totals."""
    import hashlib

    rows = [(i, t) for i, t in enumerate(texts)]
    tmp = tmp_path_factory.mktemp("heaps")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def stage(i):
        p = hashlib.md5(f"growth:{i}".encode()).hexdigest()[:2]
        return 1 if p < "40" else 2 if p < "80" else 3 if p < "c0" else 4

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    per_stage_docs = {s: 0 for s in (1, 2, 3, 4)}
    per_stage_toks = {s: 0 for s in (1, 2, 3, 4)}
    first = {}
    for i, t in rows:
        s = stage(i)
        ws = toks(t)
        per_stage_docs[s] += 1
        per_stage_toks[s] += len(ws)
        for w in ws:
            first[w] = min(first.get(w, 5), s)
    new_words = {s: sum(1 for v in first.values() if v == s) for s in (1, 2, 3, 4)}
    want, dc, tc, wc = {}, 0, 0, 0
    for s in (1, 2, 3, 4):
        dc += per_stage_docs[s]
        tc += per_stage_toks[s]
        wc += new_words[s]
        want[s] = (dc, tc, new_words[s], wc)

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    got = {
        r["stage"]: (
            r["n_docs_cum"],
            r["n_tokens_cum"],
            r["n_new_words"],
            r["n_distinct_words_cum"],
        )
        for r in catalog.queries()["x_vocab_growth_curve"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (texts, got, want)
    assert got[4][0] == len(rows)
    assert got[4][3] == len(first)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=3),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=8,
    )
)
@_SETTINGS
def test_lm_trigram_predictability_matches_python_model(
    spark, docs, tmp_path_factory
):
    """x_lm_trigram_predictability == a direct model: λ-weighted
    (1/2, 1/4, 1/4 ppm) trigram/bigram/unigram Laplace mixture over
    the 'lmtrain' hash-split train half, integer-ppm terms, per-
    component unseen floors (λ//V for trigram/bigram, λ//(N+V) for
    unigram), per-doc rollup, (0, 0, NULL, 0) for <3-word docs."""
    import hashlib

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_train import (
        _LM3_W,
    )

    tmp = tmp_path_factory.mktemp("lm3")
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def words_of(text):
        return [w.lower() for w in text.strip().split() if w]

    def is_train(doc_id):
        return hashlib.md5(f"lmtrain:{doc_id}".encode()).hexdigest()[:2] < "80"

    from collections import Counter

    uni, big, tri = Counter(), Counter(), Counter()
    for i, text in rows:
        if is_train(i):
            ws = words_of(text)
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
            tri.update(zip(ws, ws[1:], ws[2:]))
    v = len(uni)
    n = sum(uni.values())
    l3, l2, l1 = _LM3_W["tri"], _LM3_W["bi"], _LM3_W["uni"]
    want = {}
    for i, text in rows:
        ws = words_of(text)
        tgs = list(zip(ws, ws[1:], ws[2:]))
        total = unseen = 0
        for tg in tgs:
            # v == 0 (wordless train half): every floor divides by 0 —
            # NULL in both engines, sum() skips -> total coalesces to 0
            # and the mean (NULL div n) is NULL; mirror with 0 here
            if tg in tri:
                total += (l3 * (tri[tg] + 1)) // (big[tg[:2]] + v)
            else:
                total += l3 // v if v else 0
                unseen += 1
            bg = tg[1:]
            if bg in big:
                total += (l2 * (big[bg] + 1)) // (uni[bg[0]] + v)
            else:
                total += l2 // v if v else 0
            w = tg[2]
            if w in uni:
                total += (l1 * (uni[w] + 1)) // (n + v)
            else:
                total += l1 // (n + v) if v else 0
        k = len(tgs)
        mean = (total // k) if (k and v) else None
        want[i] = (k, total, mean, unseen)

    got = {
        r["doc_id"]: (
            r["n_trigrams"],
            r["mix_ppm_total"],
            r["mix_ppm_mean"],
            r["n_unseen"],
        )
        for r in catalog.queries()["x_lm_trigram_predictability"](
            spark, str(tmp)
        ).collect()
    }
    assert got == want, (docs, got, want)


def test_lm_trigram_predictability_empty_train_half(spark, tmp_path_factory):
    """v = 0 edge: a wordless train half makes every unseen floor
    divide by zero — DuckDB's // yields NULL, Spark's ANSI div THROWS
    unless gated on v > 0 (the bigram query's convention). Fixtures
    can never reach this, so pin it: totals coalesce to 0, means stay
    NULL, trigram unseen counts survive."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("lm3_v0")
    rows = [(0, ""), (1, " "), (2, ""), (3, "a b c d")]  # train docs wordless
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in catalog.queries()["x_lm_trigram_predictability"](
            spark, str(tmp)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(w)
        for w in con.execute(
            catalog.oracle_sql()["x_lm_trigram_predictability"]
        ).fetchall()
    )
    assert got == want, (got, want)
    assert got[3] == (3, 2, 0, None, 2)  # 2 trigrams unseen, NULL mean


def test_contamination_removal_consistent_with_flag_query(spark):
    """The per-source removal report must be recomputable from
    x_contamination_3gram's own output plus the documents table's
    n_chars — pins the composition to the SAME flag owner on real data
    (zero new truth logic) and the ppm ratios to integer-floor
    division."""
    import duckdb

    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    flags = {
        r["doc_id"]: r["flagged"]
        for r in catalog.queries()["x_contamination_3gram"](
            spark, SF_SMOKE
        ).collect()
    }
    meta = duckdb.connect().execute(
        f"SELECT doc_id, source, n_chars FROM"
        f" read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    agg = {}
    for doc_id, source, n_chars in meta:
        if doc_id not in flags:  # bench slice: not scored, not reported
            continue
        n, rm, ct, cl = agg.get(source, (0, 0, 0, 0))
        f = flags[doc_id]
        agg[source] = (n + 1, rm + f, ct + n_chars, cl + (n_chars if f else 0))
    want = {
        s: (
            n,
            rm,
            (1000000 * rm) // n,
            ct,
            cl,
            (1000000 * cl) // ct if ct > 0 else None,
        )
        for s, (n, rm, ct, cl) in agg.items()
    }
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_removed"],
            r["removed_ppm"],
            r["chars_total"],
            r["chars_lost"],
            r["chars_lost_ppm"],
        )
        for r in catalog.queries()["x_contamination_removal"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want, (got, want)
    # the composition is non-degenerate on the smoke fixture: at least
    # one source, and every train doc accounted for exactly once
    assert got and sum(v[0] for v in got.values()) == len(flags)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=2),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=7,
    )
)
@_SETTINGS
def test_dedup_containment_topk_matches_python_model(
    spark, docs, tmp_path_factory
):
    """x_dedup_containment_topk == a direct model: distinct 3-word
    shingle sets, all (a<b) pairs of shingle-bearing docs, integer-ppm
    containment/jaccard, (cont_max_ppm DESC, id_a, id_b) top-20. A
    truncation pair (doc 0 = the first 5 words of doc 1's 40-word
    text) is PLANTED so the jaccard_misses=true case — absent from the
    fixtures, whose sample maxes out at containment 0.125 — is
    exercised on every run."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_curate import (
        _CONT_TOPK,
    )

    big = [f"w{i}" for i in range(40)]
    rows = [(0, " ".join(big[:5])), (1, " ".join(big))] + [
        (i + 2, " ".join(words)) for i, words in enumerate(docs)
    ]
    tmp = tmp_path_factory.mktemp("cont")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))

    def shingles(text):
        ws = text.strip().split() if text.strip() else []
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    sets = {i: s for i, s in sets.items() if s}
    model = []
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            inter = len(sets[a] & sets[b])
            sa, sb = len(sets[a]), len(sets[b])
            union = sa + sb - inter
            model.append(
                (
                    a,
                    b,
                    inter,
                    sa,
                    sb,
                    (1000000 * inter) // min(sa, sb),
                    (1000000 * inter) // max(sa, sb),
                    (1000000 * inter) // union,
                    2 * inter < union,
                )
            )
    model.sort(key=lambda r: (-r[5], r[0], r[1]))
    want = model[:_CONT_TOPK]

    got = [
        (
            r["id_a"],
            r["id_b"],
            r["n_inter"],
            r["size_a"],
            r["size_b"],
            r["cont_max_ppm"],
            r["cont_min_ppm"],
            r["jaccard_ppm"],
            r["jaccard_misses"],
        )
        for r in catalog.queries()["x_dedup_containment_topk"](
            spark, str(tmp)
        ).collect()
    ]
    # engine output arrives in the query's own total order
    assert got == want, (docs, got, want)
    # the planted truncation pair: full containment of doc 0 in doc 1,
    # jaccard 3/38 — flagged as a jaccard miss, and ranked first
    planted = [r for r in got if (r[0], r[1]) == (0, 1)]
    assert planted and planted[0][5] == 1000000 and planted[0][8] is True
    assert got[0][:2] == (0, 1)


def test_dedup_containment_topk_degenerate_corpus(spark, tmp_path_factory):
    """Shingle-less docs (under 3 words, empty, NULL text) are excluded
    on BOTH engine sides before any division — a NULL/short-only corpus
    yields zero rows in both engines rather than a NULL-comparison
    divergence (Spark ANSI size(NULL) is NULL, DuckDB len(NULL) is
    NULL; both comparisons drop). One 3-word doc alone (no pair
    partner) also yields zero rows."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    for tag, rows in [
        ("allshort", [(0, None), (1, ""), (2, "one two"), (3, " ")]),
        ("lonedoc", [(0, None), (1, "a b c")]),
    ]:
        tmp = tmp_path_factory.mktemp(f"cont_{tag}")
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(str(tmp / "documents.parquet"))
        got = catalog.queries()["x_dedup_containment_topk"](
            spark, str(tmp)
        ).collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp}/documents.parquet/*.parquet')"
        )
        want = con.execute(
            catalog.oracle_sql()["x_dedup_containment_topk"]
        ).fetchall()
        assert got == [] and want == [], (tag, got, want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6),
        min_size=1,
        max_size=12,
    ),
    flip=st.booleans(),
)
@_SETTINGS
def test_incremental_minhash_matches_python_model(spark, docs, flip):
    """Full-chain semantics of the batch-vs-corpus near-dup probe
    (VERDICT r6 #2) against a direct python model: words -> 3-word
    shingles -> 8-seed md5 MinHash (sentinel for short/empty docs) ->
    4x2 banding -> cross-half bucket collision -> >=4/8 signature
    verify -> anti-join. The tiny 4-word alphabet forces real
    collisions; ascii single-space texts make python split() identical
    to the engine's \\s+ split of trimmed text. Exercises the sentinel
    path (short docs collide with each other by design, matching the
    self-join pair generator); a 1-doc corpus with `flip` covers BOTH
    the empty-corpus and the empty-batch half."""
    import hashlib

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import (
        dedup as D,
    )

    rows = [
        (i, " ".join(ws), "src1" if (i + flip) % 2 == 0 else "src0")
        for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id
        for r in D.incremental_lsh_dedup(
            df.filter("source = 'src1'"), df.filter("source <> 'src1'")
        ).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    def sig(text: str) -> list[str]:
        ws = text.split()
        sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if not sh:
            return ["z" * 32] * 8
        return [min(md5(f"{j}:{s}") for s in sh) for j in range(8)]

    def bands(s: list[str]) -> set:
        return {(b, md5(s[2 * b] + "|" + s[2 * b + 1])) for b in range(4)}

    sigs = {i: sig(t) for i, t, _ in rows}
    batch_ids = {i for i, _, src in rows if src == "src1"}
    corpus_ids = {i for i, _, src in rows if src != "src1"}
    contaminated = {
        b
        for b in batch_ids
        for c in corpus_ids
        if bands(sigs[b]) & bands(sigs[c])
        and sum(x == y for x, y in zip(sigs[b], sigs[c])) * 2 >= 8
    }
    assert got == batch_ids - contaminated, (docs, got)


@given(
    chars=st.lists(
        st.tuples(
            st.sampled_from(["de", "en", "es", "fr", "zh"]),
            st.integers(min_value=0, max_value=1_000_000),
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_mixture_epochs_matches_python_model(spark, chars, tmp_path_factory):
    """x_mixture_epochs == the integer data-constrained planner: per
    lang, weight = isqrt(avail), target = 2·total·weight // Σweight
    (exact integers), epochs = ceil(target/avail), unique_ppm =
    min(avail, target)·1e6 // target — with the zero guards (empty
    lang, zero total) yielding zeros, never errors."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    tmp = tmp_path_factory.mktemp("epochs")
    rows = [(i, lang, n) for i, (lang, n) in enumerate(chars)]
    spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    avail: dict[str, int] = {}
    for lang, n in chars:
        avail[lang] = avail.get(lang, 0) + n
    weight = {g: math.isqrt(a) for g, a in avail.items()}
    total, wsum = sum(avail.values()), sum(weight.values())
    want = {}
    for g, a in avail.items():
        t = (2 * total * weight[g]) // wsum if wsum > 0 else 0
        want[g] = (
            a,
            weight[g],
            t,
            (t + a - 1) // a if a > 0 else 0,
            (min(a, t) * 1_000_000) // t if t > 0 else 0,
        )

    got = {
        r["lang"]: (
            r["avail_chars"],
            r["weight"],
            r["target_chars"],
            r["epochs"],
            r["unique_ppm"],
        )
        for r in catalog.queries()["x_mixture_epochs"](spark, str(tmp)).collect()
    }
    assert got == want, (chars, got, want)


def test_packing_efficiency_survives_huge_docs(spark, tmp_path_factory):
    """Proactive r7 sweep of the r5/r6 ADVICE overflow class:
    utilization_ppm's product sum(block_chars)·1e6 must not ride
    BIGINT — it overflows once a source packs > ~9.2e12 chars (≈ 9 TB,
    reachable at the 100 TB design point). Three 2^44-char docs put
    the product ≈ 5.3e19 past 2^63−1; both engines must return the
    exact floor ppm via their 128-bit-capable types."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_train import (
        _PACK_BUDGET as budget,
    )

    big = 1 << 44
    rows = [(i, "s", big + i) for i in range(3)]  # slightly unequal blocks
    tmp = tmp_path_factory.mktemp("pack_huge")
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    # pack model: cum_before // budget — huge docs land in 3 distinct blocks
    sizes = [big, big + 1, big + 2]
    cum = [0, sizes[0], sizes[0] + sizes[1]]
    assert len({c // budget for c in cum}) == 3
    total = sum(sizes)
    product = total * 1_000_000
    assert product > 2**63 - 1  # the overflow is real
    want_ppm = product // (3 * budget)
    want = ("s", 3, total, want_ppm, min(sizes), max(sizes))

    got = [
        (
            r["source"],
            r["n_blocks"],
            r["total_chars"],
            r["utilization_ppm"],
            r["min_block_chars"],
            r["max_block_chars"],
        )
        for r in catalog.queries()["x_packing_efficiency"](spark, str(tmp)).collect()
    ]
    assert got == [want]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    got_o = con.execute(catalog.oracle_sql()["x_packing_efficiency"]).fetchall()
    assert [tuple(r) for r in got_o] == [want]


def test_aggregate_ppm_exprs_survive_huge_counts(spark):
    """The vocab-coverage and BPE-fertility ppm products are corpus-
    wide COUNTED totals (not plantable through fixture data the way
    n_chars is), so this pins their exact expression owners on literal
    huge values instead: both engines must floor the 128-bit product
    identically once total·1e6 exceeds 2^63−1."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_scale import (
        _COVERAGE_PPM_ORACLE,
        _COVERAGE_PPM_SPARK,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_tokenizer import (
        _FERTILITY_CPT_ORACLE,
        _FERTILITY_CPT_SPARK,
        _FERTILITY_TPW_ORACLE,
        _FERTILITY_TPW_SPARK,
    )

    con = duckdb.connect()

    # --- coverage: covered·1e6 ≈ 1.76e19 > 2^63−1
    covered, total = (1 << 44) + 3, (1 << 45) - 1
    want_cov = covered * 1_000_000 // total
    assert covered * 1_000_000 > 2**63 - 1
    got_s = (
        spark.createDataFrame(
            [(covered, total)], "covered_tokens long, total_tokens long"
        )
        .selectExpr(f"{_COVERAGE_PPM_SPARK} AS p")
        .first()["p"]
    )
    got_o = con.execute(
        f"SELECT {_COVERAGE_PPM_ORACLE} FROM (SELECT CAST(? AS BIGINT) AS cum_n,"
        " CAST(? AS BIGINT) AS total_n)",
        [covered, total],
    ).fetchone()[0]
    assert got_s == got_o == want_cov

    # --- fertility: two (cnt, ns, nc) rows; sums exceed 2^63−1 after ·1e6
    rows = [(1 << 43, 2, 7), (3, 1, 5)]
    n_words = sum(c for c, _, _ in rows)
    n_tok = sum(c * s for c, s, _ in rows)
    n_chars = sum(c * n for c, _, n in rows)
    assert 1_000_000 * n_tok > 2**63 - 1
    want_tpw = 1_000_000 * n_tok // n_words
    want_cpt = 1_000_000 * n_chars // n_tok
    got = (
        spark.createDataFrame(
            [(n_words, n_tok, n_chars)],
            "n_words long, n_bpe_tokens long, n_word_chars long",
        )
        .selectExpr(
            f"{_FERTILITY_TPW_SPARK} AS tpw", f"{_FERTILITY_CPT_SPARK} AS cpt"
        )
        .first()
    )
    got_o = con.execute(
        f"SELECT {_FERTILITY_TPW_ORACLE} AS tpw, {_FERTILITY_CPT_ORACLE} AS cpt"
        " FROM (SELECT unnest([" +
        ",".join(f"{{'cnt': CAST({c} AS BIGINT), 'ns': CAST({s} AS BIGINT),"
                 f" 'nc': CAST({n} AS BIGINT)}}" for c, s, n in rows) +
        "], recursive := true))"
    ).fetchone()
    assert (got["tpw"], got["cpt"]) == tuple(got_o) == (want_tpw, want_cpt)


@given(
    ns=st.lists(st.integers(min_value=1, max_value=2**62), min_size=1, max_size=30)
)
@_SETTINGS
def test_ilog16_integer_log_properties_and_cross_engine(spark, ns):
    """operators/unigram.ilog16: exact 16·log2 at powers of two, within
    the documented in-octave interpolation error elsewhere, monotone —
    and bit-identical to the DuckDB SQL form the unigram oracles embed
    (the cross-engine contract the whole tier's exactness rests on)."""
    import duckdb

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.unigram import (
        ilog16,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_tokenizer import (
        _uni_ilog16_sql,
    )

    vals = sorted(set(ns) | {1, 2, 3, 95, (1 << 40) - 1, 1 << 40, (1 << 62) + 7})
    got = [ilog16(n) for n in vals]
    # exact at powers of two; elsewhere the linear chord undershoots
    # log2 by at most 1/ln2 − 1 − log2(1/ln2) ≈ 0.0861 bits (1.378
    # sixteenths) and the floor takes at most one more
    for n, g in zip(vals, got):
        if n & (n - 1) == 0:
            assert g == 16 * (n.bit_length() - 1), n
        true = 16 * math.log2(n)
        assert true - 2.378 - 1e-9 <= g <= true + 1e-9, (n, g, true)
    # monotone non-decreasing over sorted inputs
    assert got == sorted(got)
    # DuckDB computes the identical integers from the same SQL owner
    duck = duckdb.connect().execute(
        f"SELECT {_uni_ilog16_sql('x')} FROM (SELECT unnest(?) AS x) ",
        [[*map(int, vals)]],
    ).fetchall()
    assert [int(r[0]) for r in duck] == got


@given(
    commits=st.lists(
        st.tuples(
            st.booleans(),  # True = append, False = replace
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=15),  # key
                    st.sampled_from(["a", "b", None]),  # group (incl. NULL)
                    st.integers(min_value=-5, max_value=5),  # value
                ),
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=2,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_advance_rollup_equals_full_recompute_for_any_commit_sequence(
    spark, commits, tmp_path_factory
):
    """IVM soundness under ARBITRARY commit histories: whatever mix of
    appends and keyed replaces lands (including NULL group keys,
    negative values, deleted keys and empty commits), advancing the
    materialized rollup version-by-version must equal the full
    recompute at every step."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tmp = tmp_path_factory.mktemp("ivm_prop")
    tbl = str(tmp / "tbl")
    measures = {"n": F.lit(1), "s": F.col("v")}
    schema = "id long, g string, v long"

    # build the version history: appends add NEW keys (id offset per
    # commit keeps keys unique); replaces overwrite the FULL state with
    # the given rows (keyed on id)
    state: dict[int, tuple] = {}
    versions = []
    for ci, (is_append, rows) in enumerate(commits):
        rows = [(ci * 100 + k if is_append else k, g, v) for k, g, v in rows]
        # keys must be unique within a snapshot (the change feed is keyed)
        rows = list({r[0]: r for r in rows}.values())
        if is_append and state:
            rows = [r for r in rows if r[0] not in state]
        df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
        if is_append or not versions:
            if not rows:
                continue  # empty append = no commit (the writer's short-circuit)
            versioned.commit_append(df, tbl)
            state.update({r[0]: r for r in rows})
        else:
            versioned.commit_replace(df, tbl)
            state = {r[0]: r for r in rows}
        versions.append(dict(state))
    if len(versions) < 2:
        return

    def full(vstate):
        agg: dict = {}
        for _, g, v in vstate.values():
            n, s = agg.get(g, (0, 0))
            agg[g] = (n + 1, s + v)
        return agg

    rollup = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )
    for v in range(1, len(versions)):
        rollup = advance_rollup(
            spark, tbl, "id", ["g"], measures, rollup, v - 1, v, drop_when_zero="n"
        )
        got = {r["g"]: (r["n"], r["s"]) for r in rollup.collect()}
        want = full(versions[v])
        assert got == want, (v, got, want, commits)
        # re-materialize so the next advance reads a table, not lineage
        rollup = spark.createDataFrame(
            [(g, n, s) for g, (n, s) in got.items()], "g string, n long, s long"
        )


@given(
    commits=st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    probe=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=6),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_key_probe_pruning_never_drops_matching_rows(
    spark, commits, probe, tmp_path_factory
):
    """Data-skipping soundness (VERDICT r8 #2): for ANY commit history
    (duplicate keys across commits included) and ANY probe key set, the
    pruned key-probe read contains EVERY row whose key is probed — the
    no-false-negatives property blooms + min/max zones must preserve.
    Probes include keys absent from the table (may prune to nothing)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    tmp = tmp_path_factory.mktemp("bloom_prop")
    tbl = str(tmp / "tbl")
    all_rows = []
    for ci, keys in enumerate(commits):
        rows = [(k, f"c{ci}-k{k}") for k in sorted(set(keys))]
        all_rows.extend(rows)
        versioned.commit_append(
            spark.createDataFrame(rows, "k long, payload string"),
            tbl,
            bloom_keys=["k"],
            bloom_m_bits=256,  # small bitmap: force false POSITIVES, never negatives
        )
    want = {(k, p) for k, p in all_rows if k in set(probe)}
    got_df = versioned.read_version_for_keys(spark, tbl, "k", probe)
    got = {(r.k, r.payload) for r in got_df.collect() if r.k in set(probe)}
    assert got == want, (got, want, commits, probe)


@given(
    commits=st.lists(
        st.tuples(
            st.booleans(),  # True = append, False = replace
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=15),  # key
                    st.sampled_from(["a", "b", None]),  # group (incl. NULL)
                    st.integers(min_value=-5, max_value=5),  # value
                ),
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=2,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_advance_rollup_minmax_equals_full_recompute_for_any_commit_sequence(
    spark, commits, tmp_path_factory
):
    """VERDICT r8 #4: MIN/MAX measures under ARBITRARY commit histories
    (replaces that delete the current max, NULL groups, vanished and
    reborn groups) — the affected-group recompute must equal the full
    recompute at every advance step."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tmp = tmp_path_factory.mktemp("ivm_mm_prop")
    tbl = str(tmp / "tbl")
    measures = {"n": F.lit(1), "s": F.col("v")}
    extremes = {"mx": ("max", F.col("v")), "mn": ("min", F.col("v"))}
    schema = "id long, g string, v long"

    state: dict[int, tuple] = {}
    versions = []
    for ci, (is_append, rows) in enumerate(commits):
        rows = [(ci * 100 + k if is_append else k, g, v) for k, g, v in rows]
        rows = list({r[0]: r for r in rows}.values())
        if is_append and state:
            rows = [r for r in rows if r[0] not in state]
        df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
        if is_append or not versions:
            if not rows:
                continue
            versioned.commit_append(df, tbl)
            state.update({r[0]: r for r in rows})
        else:
            versioned.commit_replace(df, tbl)
            state = {r[0]: r for r in rows}
        versions.append(dict(state))
    if len(versions) < 2:
        return

    def full(vstate):
        agg: dict = {}
        for _, g, v in vstate.values():
            n, s, mx, mn = agg.get(g, (0, 0, None, None))
            agg[g] = (
                n + 1,
                s + v,
                v if mx is None else max(mx, v),
                v if mn is None else min(mn, v),
            )
        return agg

    rollup = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("g")
        .agg(
            F.sum(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
            F.min("v").alias("mn"),
        )
    )
    for v in range(1, len(versions)):
        rollup = advance_rollup(
            spark, tbl, "id", ["g"], measures, rollup, v - 1, v,
            drop_when_zero="n", extreme_measures=extremes,
        )
        got = {r["g"]: (r["n"], r["s"], r["mx"], r["mn"]) for r in rollup.collect()}
        want = full(versions[v])
        assert got == want, (v, got, want, commits)
        rollup = spark.createDataFrame(
            [(g, n, s, mx, mn) for g, (n, s, mx, mn) in got.items()],
            "g string, n long, s long, mx long, mn long",
        )


@given(
    members=st.lists(
        st.tuples(
            st.sampled_from([0, 1]),  # home cell
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=2,
        max_size=12,
    ).filter(lambda ms: any(c == 0 for c, _, _ in ms) and not all(x == 0 and y == 0 for _, x, y in ms))
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_split_drifted_cells_partitions_members_and_keeps_fresh_ids(spark, members):
    """Partial re-clustering invariants under ARBITRARY member sets:
    the reassignment covers EXACTLY the drifted cell's members, every
    new cell id is fresh (> max existing seed id), and the stable
    cell's members never appear in the output."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        split_drifted_cells,
    )

    rows = [
        (i, [float(x) + 0.01, float(y) + 0.02, 1.0], c)
        for i, (c, x, y) in enumerate(members)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, cell long")
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.5]), (1, [0.0, 1.0, 0.5])], "seed_id long, seed_vec array<float>"
    )
    new_seeds, reassigned = split_drifted_cells(df, seeds, [0], iters=2)
    got = reassigned.collect()
    want_ids = {i for i, (c, _, _) in enumerate(members) if c == 0}
    assert {r.vec_id for r in got} == want_ids
    assert all(r.cell in (2, 3) for r in got), got
    seed_ids = {r.seed_id for r in new_seeds.collect()}
    assert seed_ids == {1, 2, 3}
    assert all(r.dist_ppm >= 0 for r in got)


@given(
    commits=st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=6),
        min_size=2,
        max_size=4,
    ),
    probe=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=5),
    clustered=st.booleans(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_key_probe_pruning_sound_across_compaction(
    spark, commits, probe, clustered, tmp_path_factory
):
    """Maintenance composition soundness: after ANY commit history is
    compacted (clustered or plain, re-bloomed or not), a key probe
    still returns every matching row — retired bloom entries must
    never prune the rewritten files that now hold their keys."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    tmp = tmp_path_factory.mktemp("bloom_compact_prop")
    tbl = str(tmp / "tbl")
    all_rows = []
    for ci, keys in enumerate(commits):
        rows = [(k, f"c{ci}-k{k}") for k in sorted(set(keys))]
        all_rows.extend(rows)
        versioned.commit_append(
            spark.createDataFrame(rows, "k long, payload string"),
            tbl,
            bloom_keys=["k"],
            bloom_m_bits=256,
        )
    if clustered:
        versioned.compact(spark, tbl, target_files=2, cluster_by=["k"], bloom_keys=["k"], bloom_m_bits=256)
    else:
        versioned.compact(spark, tbl, target_files=2)
    want = {(k, p) for k, p in all_rows if k in set(probe)}
    got_df = versioned.read_version_for_keys(spark, tbl, "k", probe)
    got = {(r.k, r.payload) for r in got_df.collect() if r.k in set(probe)}
    assert got == want, (got, want, commits, probe, clustered)


@given(
    commits=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),  # key
                st.integers(min_value=-9, max_value=9),  # value
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    ),
    updates=st.dictionaries(
        st.integers(min_value=0, max_value=15),  # keys incl. absent ones
        st.integers(min_value=100, max_value=120),
        min_size=0,
        max_size=6,
    ),
    insert_unmatched=st.booleans(),
    deletion_vectors=st.booleans(),
)
@_SETTINGS
def test_commit_merge_equals_reference_merge_semantics(
    spark, commits, updates, insert_unmatched, deletion_vectors, tmp_path_factory
):
    """MERGE soundness (r10): for ANY commit history (duplicate keys
    across commits — every matching ROW updates, row identity
    preserved) and ANY update batch, the post-merge snapshot equals
    the reference semantics computed in plain Python: matched rows get
    the update's value, unmatched rows pass through, unmatched update
    keys insert iff insert_unmatched."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    tmp = tmp_path_factory.mktemp("merge_prop")
    tbl = str(tmp / "tbl")
    all_rows = []
    for ci, rows in enumerate(commits):
        tagged = [(k, v, f"c{ci}-{i}") for i, (k, v) in enumerate(rows)]
        all_rows.extend(tagged)
        versioned.commit_append(
            spark.createDataFrame(tagged, "k long, v long, tag string"),
            tbl,
            bloom_keys=["k"],
            bloom_m_bits=256,  # force bloom false positives — superset reads
        )
    upd = spark.createDataFrame(
        [(k, v) for k, v in updates.items()], "k long, v long"
    ) if updates else spark.createDataFrame([], "k long, v long")
    v = versioned.commit_merge(
        spark,
        tbl,
        upd,
        key="k",
        insert_unmatched=insert_unmatched,
        deletion_vectors=deletion_vectors,  # both physical shapes, one semantics
    )

    existing_keys = {k for k, _, _ in all_rows}
    want = {(k, updates.get(k, v0) if k in updates else v0, tag) for k, v0, tag in all_rows}
    if insert_unmatched:
        want |= {(k, v0, None) for k, v0 in updates.items() if k not in existing_keys}
    got = {(r.k, r.v, r.tag) for r in versioned.read_version(spark, tbl, v).collect()}
    assert got == want, (got, want, commits, updates, insert_unmatched)


@given(
    commits=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=-9, max_value=9),
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    ),
    del_keys=st.sets(st.integers(min_value=0, max_value=15), min_size=0, max_size=6),
    deletion_vectors=st.booleans(),
)
@_SETTINGS
def test_commit_delete_equals_reference_delete_semantics(
    spark, commits, del_keys, deletion_vectors, tmp_path_factory
):
    """DELETE soundness (r10): for ANY history and ANY key set, the
    post-delete snapshot is exactly the non-matching rows — the keyed
    prune (with bloom false positives forced) never strands a matching
    row in an unscanned file."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    tmp = tmp_path_factory.mktemp("del_prop")
    tbl = str(tmp / "tbl")
    all_rows = []
    for ci, rows in enumerate(commits):
        tagged = [(k, v, f"c{ci}-{i}") for i, (k, v) in enumerate(rows)]
        all_rows.extend(tagged)
        versioned.commit_append(
            spark.createDataFrame(tagged, "k long, v long, tag string"),
            tbl,
            bloom_keys=["k"],
            bloom_m_bits=256,
        )
    keys = sorted(del_keys)
    cond = "k IN (%s)" % ",".join(map(str, keys)) if keys else "FALSE"
    v = versioned.commit_delete(
        spark, tbl, condition=cond,
        prune={"k": {"values": keys}} if keys else None,
        deletion_vectors=deletion_vectors,  # both physical shapes, one semantics
    )
    want = {(k, v0, tag) for k, v0, tag in all_rows if k not in del_keys}
    got = {(r.k, r.v, r.tag) for r in versioned.read_version(spark, tbl, v).collect()}
    assert got == want, (got, want, commits, del_keys)


@given(
    commits=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=-9, max_value=9),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=2,
        max_size=4,
    ),
    ops=st.lists(
        st.sampled_from(["merge", "delete", "append", "dv_delete"]),
        min_size=1,
        max_size=3,
    ),
)
@_SETTINGS
def test_delta_manifests_resolve_identically_for_any_history(
    spark, commits, ops, tmp_path_factory
):
    """Incremental-manifest soundness (r10): for ANY history of
    appends/merges/deletes, (a) every version's resolved manifest is
    UNCHANGED when any prefix of the stored delta records is rewritten
    as full checkpoints (the invariant vacuum's chain-head
    materialization relies on), and (b) every version's row set reads
    identically before and after full materialization."""
    import json as _json
    import os as _os

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    tmp = tmp_path_factory.mktemp("delta_manifest_prop")
    tbl = str(tmp / "tbl")
    for ci, rows in enumerate(commits):
        tagged = [(k, v, f"c{ci}-{i}") for i, (k, v) in enumerate(rows)]
        versioned.commit_append(
            spark.createDataFrame(tagged, "k long, v long, tag string"),
            tbl,
            bloom_keys=["k"],
            bloom_m_bits=256,
        )
    for oi, op in enumerate(ops):
        if op == "merge":
            versioned.commit_merge(
                spark,
                tbl,
                spark.createDataFrame([(3, 100 + oi)], "k long, v long"),
                key="k",
            )
        elif op == "delete":
            versioned.commit_delete(
                spark, tbl, condition="k = 7", prune={"k": {"values": [7]}}
            )
        elif op == "dv_delete":
            versioned.commit_delete(
                spark, tbl, condition=f"k = {oi + 1}", deletion_vectors=True
            )
        else:
            versioned.commit_append(
                spark.createDataFrame([(20 + oi, oi, "x")], "k long, v long, tag string"),
                tbl,
            )

    versions = versioned._manifests(tbl)
    before = {v: versioned._manifest_of(tbl, v) for v in versions}
    reads = {
        v: {(r.k, r.v) for r in versioned.read_version(spark, tbl, v).select("k", "v").collect()}
        for v in versions
    }
    for v in versions:
        with open(_os.path.join(tbl, f"_v{v}.json"), "w") as fh:
            _json.dump(before[v], fh)
        after = {u: versioned._manifest_of(tbl, u) for u in versions}
        assert after == before, f"materializing v{v} changed a resolved manifest"
    for v in versions:
        got = {
            (r.k, r.v)
            for r in versioned.read_version(spark, tbl, v).select("k", "v").collect()
        }
        assert got == reads[v], f"v{v} reads changed after materialization"
