"""Property-based spot checks (SURVEY §5.4), via hypothesis.

Mirrors the reference invariants: order-insensitive task identity
(ref ``pkg/hash/hash.go:31-40``), SET-semantics dedup idempotence
(ref ``internal/core/resource.go:54-108``), and filter/dedup
commutativity of the ingest pipeline.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from chyme_spark.catalog import ingest, with_resource_columns

_ext = st.sampled_from(["mov", "MOV", "mp4", "txt", "json", ""])
_name = st.text(alphabet="abcdefgh123", min_size=1, max_size=6)
_url = st.builds(
    lambda b, k, e: f"s3://{b}/{k}" + (f".{e}" if e else ""), _name, _name, _ext
)
_urls = st.lists(_url, min_size=1, max_size=12)

_PROPERTY_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


@_PROPERTY_SETTINGS
@given(urls=_urls)
def test_ingest_idempotent_under_duplication(spark, urls):
    once = sorted(r.url for r in ingest(_df(spark, urls), "ext/mov/mp4").collect())
    doubled = sorted(r.url for r in ingest(_df(spark, urls + urls), "ext/mov/mp4").collect())
    assert once == doubled


@_PROPERTY_SETTINGS
@given(urls=_urls)
def test_filter_commutes_with_dedup(spark, urls):
    cat = with_resource_columns(_df(spark, urls))
    pred = F.lower(F.col("url")).rlike(r"^(.+)\.(mov)$")
    a = sorted(r.url for r in cat.filter(pred).dropDuplicates(["url"]).collect())
    b = sorted(r.url for r in cat.dropDuplicates(["url"]).filter(pred).collect())
    assert a == b


@_PROPERTY_SETTINGS
@given(h1=st.text(min_size=1, max_size=20), h2=st.text(min_size=1, max_size=20))
def test_collated_hash_order_insensitive(spark, h1, h2):
    df = spark.range(1).select(
        F.sha1(F.concat(F.least(F.lit(h1), F.lit(h2)), F.greatest(F.lit(h1), F.lit(h2)))).alias("a"),
        F.sha1(F.concat(F.least(F.lit(h2), F.lit(h1)), F.greatest(F.lit(h2), F.lit(h1)))).alias("b"),
    )
    row = df.collect()[0]
    assert row.a == row.b


# --- round-6: sub-document dedup scrub vs a pure-Python model ---------------

_word = st.sampled_from(["a", "bb", "ccc", "dd", "é", "词", "x1"])
_doc_words = st.lists(_word, min_size=0, max_size=14)
_corpus = st.lists(_doc_words, min_size=1, max_size=6)


def _py_scrub(texts: list[str], k: int) -> dict[int, tuple[str, int, int]]:
    seen: set[str] = set()
    out = {}
    for doc_id, text in enumerate(texts):
        ws = text.split(" ")
        segs = [" ".join(ws[i * k : (i + 1) * k]) for i in range((len(ws) + k - 1) // k)]
        kept = []
        for s in segs:
            if s in seen:
                continue
            seen.add(s)
            kept.append(s)
        out[doc_id] = (" ".join(kept), len(kept), len(segs) - len(kept))
    return out


@_PROPERTY_SETTINGS
@given(corpus=_corpus, k=st.sampled_from([1, 3, 8]))
def test_segment_scrub_matches_python_model(spark, corpus, k):
    """segment_scrub == the obvious sequential keep-first model, on
    adversarial corpora: empty docs (''.split -> ['']), unicode words,
    intra-doc repeats, whole-doc duplicates, segment width 1 (word-level
    dedup) through 8."""
    from chyme_spark.ops.llm import segment_scrub

    texts = [" ".join(ws) for ws in corpus]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["scrubbed_text"], r["n_kept"], r["n_removed"])
        for r in segment_scrub(docs, seg_words=k).collect()
    }
    assert got == _py_scrub(texts, k)


_chunk_text = st.text(alphabet="abc ", min_size=0, max_size=40)


@_PROPERTY_SETTINGS
@given(
    texts=st.lists(_chunk_text, min_size=1, max_size=5),
    window=st.sampled_from([1, 3, 7, 10]),
    stride=st.sampled_from([1, 2, 5, 10]),
)
def test_chunk_windows_matches_python_model(spark, texts, window, stride):
    """chunk_windows == the obvious sequential chunker for arbitrary
    window/stride geometry (stride > window gaps excluded — coverage
    requires stride <= window), including empty docs and exact-fit
    boundaries."""
    from chyme_spark.ops.training import chunk_windows

    if stride > window:
        stride = window
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in chunk_windows(docs, window=window, stride=stride).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    import math

    for doc_id, text in enumerate(texts):
        n = 1 if len(text) <= window else 1 + math.ceil((len(text) - window) / stride)
        expect = {i: text[i * stride : i * stride + window] for i in range(n)}
        assert got[doc_id] == expect, (doc_id, window, stride)


def _py_boilerplate(texts: list[str], k: int, min_df: int) -> dict[int, tuple[str, int, int]]:
    from collections import Counter

    per_doc_segs = []
    df: Counter = Counter()
    for text in texts:
        ws = text.split(" ")
        segs = [" ".join(ws[i * k : (i + 1) * k]) for i in range((len(ws) + k - 1) // k)]
        per_doc_segs.append(segs)
        for s in set(segs):
            df[s] += 1
    out = {}
    for doc_id, segs in enumerate(per_doc_segs):
        kept = [s for s in segs if df[s] < min_df]
        out[doc_id] = (" ".join(kept), len(segs) - len(kept), len(segs))
    return out


@_PROPERTY_SETTINGS
@given(corpus=_corpus, k=st.sampled_from([1, 3, 8]), min_df=st.sampled_from([2, 3]))
def test_boilerplate_scrub_matches_python_model(spark, corpus, k, min_df):
    """boilerplate_scrub == the sequential document-frequency model:
    a segment's df counts each doc ONCE (intra-doc repeats don't make
    boilerplate), and removal hits every occurrence in every doc —
    including the first — unlike segment_scrub's keep-first."""
    from chyme_spark.ops.llm import boilerplate_scrub

    texts = [" ".join(ws) for ws in corpus]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_boiler"], r["n_segs"])
        for r in boilerplate_scrub(docs, seg_words=k, min_df=min_df).collect()
    }
    assert got == _py_boilerplate(texts, k, min_df)


@given(
    n=st.integers(min_value=1, max_value=5000),
    b=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200)
def test_ntile_closed_form_matches_definition(n: int, b: int):
    """x_decile_bins' closed-form bucket arithmetic must equal NTILE's
    definition (first n%B buckets get ceil(n/B) rows, the rest floor)
    for every (n, B), not just (row-count, 10) in the fixtures."""
    q, rem = divmod(n, b)

    def closed_form(r: int) -> int:
        if r <= rem * (q + 1):
            return (r - 1) // (q + 1) + 1
        return rem + (r - 1 - rem * (q + 1)) // q + 1

    # reference: assign ranks 1..n to buckets 1..B the way SQL NTILE
    # does — walk buckets in order, fat buckets first
    ref = []
    bucket, left = 1, q + 1 if rem > 0 else q
    for _ in range(n):
        ref.append(bucket)
        left -= 1
        if left == 0 and len(ref) < n:
            bucket += 1
            left = q + 1 if bucket <= rem else q
    got = [closed_form(r) for r in range(1, n + 1)]
    assert got == ref


@given(
    st.integers(min_value=1, max_value=10**15),
    st.integers(min_value=1, max_value=10**15),
)
def test_binlength_is_floor_log2_of_quotient(x: int, y: int):
    """The integer-log2 identity every whole-bit-quantized op rests on
    (x_lm_surprisal_score, x_entropy_score, x_dsir_resample):
    length(bin(q)) - 1 == floor(log2(q)) for q = x div y >= 1, and
    floor(log2(floor(r))) == floor(log2(r)) for real r >= 1 — so the
    integer division before the log loses nothing."""
    if x < y:
        x, y = y, x  # ensure q >= 1
    q = x // y
    # SQL length(bin(q)) - 1 == python bit_length - 1 (bin() = '0b...')
    assert len(bin(q)) - 2 == q.bit_length()
    # floor(log2(q)) in exact integer form: 2^bits <= q < 2^(bits+1)
    bits = q.bit_length() - 1
    assert 2**bits <= q < 2 ** (bits + 1)
    # and the same bits bracket the REAL quotient x/y (cross-multiplied
    # to stay integer-exact): truncating to the int quotient before the
    # log loses nothing
    assert 2**bits * y <= x < 2 ** (bits + 1) * y


@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
def test_phash_banding_detects_hamming_3(h: int, flips: set[int]):
    """x_image_phash_neardup's candidate guarantee (pigeonhole): two
    64-bit hashes within Hamming distance 3 MUST share at least one of
    the four 16-bit bands, so the band equi-join cannot miss them —
    the same argument SimHash chunk banding makes. Verified over
    arbitrary hashes and any <= 3 bit flips."""
    h2 = h
    for i in flips:
        h2 ^= 1 << i
    bands = [(h >> (16 * k)) & 0xFFFF for k in range(4)]
    bands2 = [(h2 >> (16 * k)) & 0xFFFF for k in range(4)]
    hamming = bin(h ^ h2).count("1")
    assert hamming <= 3
    assert any(a == b for a, b in zip(bands, bands2))


# --- FastSS deletion-neighborhood blocking (x_record_linkage, r10) ----

def _del2_neighborhood(s: str) -> set:
    """Python mirror of x_record_linkage's (i, j) variant encoding:
    (0,0) = no deletion; (i,i) = delete 1-based position i;
    (i,j), i<j = delete both positions."""
    out = {s}
    n = len(s)
    for i in range(1, n + 1):
        out.add(s[: i - 1] + s[i:])          # delete i
        for j in range(i + 1, n + 1):        # delete i and j
            out.add(s[: i - 1] + s[i : j - 1] + s[j:])
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_EDIT = st.sampled_from(["ins", "del", "sub"])


@given(
    s=st.text(alphabet="abc#0123456789", min_size=0, max_size=12),
    edits=st.lists(
        st.tuples(_EDIT, st.integers(min_value=0, max_value=20),
                  st.sampled_from("abc#0123456789")),
        min_size=0, max_size=2,
    ),
)
@settings(max_examples=400)
def test_fastss_blocking_is_complete(s: str, edits):
    """COMPLETENESS of the deletion-neighborhood key (the direction that
    silently loses pairs if wrong): any two strings within edit
    distance 2 must share a <=2-deletion variant, for arbitrary strings
    and arbitrary insert/delete/substitute edits — not just the
    fixture's Customer#%09d names."""
    t = s
    for kind, pos, ch in edits:
        p = pos % (len(t) + 1)
        if kind == "ins":
            t = t[:p] + ch + t[p:]
        elif kind == "del" and t:
            p = pos % len(t)
            t = t[:p] + t[p + 1 :]
        elif kind == "sub" and t:
            p = pos % len(t)
            t = t[:p] + ch + t[p + 1 :]
    assert _lev(s, t) <= 2  # by construction
    assert _del2_neighborhood(s) & _del2_neighborhood(t), (s, t)


def test_fastss_spark_variants_match_python_model(spark):
    """The SQL variant expression inside x_record_linkage must enumerate
    EXACTLY the Python model's <=2-deletion neighborhood (same
    substring/concat arithmetic, off-by-one-free), including the empty
    and 1-char edge cases."""
    names = ["", "x", "ab", "Customer#000000007", "aba", "##12"]
    var_expr = (
        "CASE WHEN i = 0 THEN name "
        "WHEN j = i THEN concat(substring(name, 1, i-1),"
        " substring(name, i+1, 1000000)) "
        "ELSE concat(substring(name, 1, i-1),"
        " substring(name, i+1, j-i-1), substring(name, j+1, 1000000)) END"
    )
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = (
        df.select("name", F.explode(F.expr("sequence(0, length(name))")).alias("i"))
        .select(
            "name", "i",
            F.explode(
                F.expr("CASE WHEN i = 0 THEN array(0) ELSE sequence(i, length(name)) END")
            ).alias("j"),
        )
        .select("name", F.expr(var_expr).alias("v"))
        .collect()
    )
    by_name: dict[str, set] = {}
    for r in got:
        by_name.setdefault(r.name, set()).add(r.v)
    for n in names:
        assert by_name[n] == _del2_neighborhood(n), n


# --- winnowing fingerprint guarantee (x_winnowing_fingerprint, r10) ---

def _winnow(tokens: list, k: int = 5, w: int = 4) -> set:
    """Python model of the op's selection: md5 positional k-grams,
    min per length-w window (windows clamped to >= 1 when any gram
    exists)."""
    import hashlib

    if len(tokens) < k:
        return set()
    hs = [
        hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()
        for i in range(len(tokens) - k + 1)
    ]
    return {min(hs[p : p + w]) for p in range(max(len(hs) - w + 1, 1))}


@given(
    a=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=20),
    b=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=20),
    run=st.lists(st.sampled_from("abcdef"), min_size=8, max_size=12),
)
@settings(max_examples=300)
def test_winnowing_guarantee_shared_run_shares_fingerprint(a, b, run):
    """Schleimer et al. §3: two documents sharing a token run of
    >= w+k-1 (= 8) tokens MUST share a selected fingerprint, wherever
    the run sits in either document."""
    d1, d2 = a + run + b, b + run + a
    assert _winnow(d1) & _winnow(d2), (d1, d2)


# --- block-matrix decomposition exactness (x_embedding_neardup, r11) ---

_EMB_PROP_COUNTER = [0]


@pytest.fixture(scope="module")
def emb_prop_root(tmp_path_factory):
    """Per-run root for the hypothesis examples' parquet fixtures —
    pytest's session tmp dir is reaped automatically (keeps the last
    few runs), so example dirs no longer accumulate under a fixed
    /tmp path across runs (ADVICE r11)."""
    return str(tmp_path_factory.mktemp("chyme_prop_emb"))


@_PROPERTY_SETTINGS
@given(
    rows=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4),
        min_size=2,
        max_size=18,
    ),
    n_blocks=st.sampled_from([1, 5, 37]),
)
def test_embedding_neardup_blocking_matches_bruteforce(
    spark, emb_prop_root, rows, n_blocks
):
    """The block-pair equi-join + per-cell chunked gemm must return
    EXACTLY the brute-force cosine pairs for any vector set and any
    block granularity — n_blocks=1 exercises the diagonal-only path,
    5 the cross-block cells, 37 (>> n) mostly-empty cells. Integer
    components make every dot/norm exact in float64, so the comparison
    is equality, not tolerance."""
    import math

    from hypothesis import assume

    from chyme_spark.ops.llm import _np_round4, x_embedding_neardup

    assume(all(any(v) for v in rows))  # zero vectors have no cosine
    _EMB_PROP_COUNTER[0] += 1
    d = f"{emb_prop_root}/{_EMB_PROP_COUNTER[0]}"
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    got = sorted(
        (r.vec_a, r.vec_b, r.cosine)
        for r in x_embedding_neardup(spark, d, n_blocks=n_blocks).collect()
    )

    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dot = sum(x * y for x, y in zip(rows[i], rows[j]))
            raw = dot / (
                math.sqrt(sum(x * x for x in rows[i]))
                * math.sqrt(sum(x * x for x in rows[j]))
            )
            if raw >= 0.45:  # RAW threshold, rounded report — op semantics
                want.append((i, j, float(_np_round4(raw))))
    assert got == sorted(want)
