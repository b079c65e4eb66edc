"""Property-based tests (hypothesis) for the generation engine.

Goes beyond the reference's test strategy (SURVEY §5 notes it has no
property-based testing): for randomly drawn specs we assert the three
load-bearing invariants — two-build determinism, partition independence,
and range/type conformance.

Examples are kept small (Spark round-trips are ~100ms each); the point is
spec-space coverage, not row volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dbldatagen_spark import DataGenerator

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


def _fingerprint(df):
    rows = sorted(map(tuple, df.collect()))
    return hash(tuple(rows))


@given(
    lo=st.integers(min_value=-10_000, max_value=10_000),
    span=st.integers(min_value=0, max_value=50_000),
    step=st.integers(min_value=1, max_value=7),
    random=st.booleans(),
)
@settings(**_SETTINGS)
def test_int_range_bounds_and_determinism(lo, span, step, random):
    hi = lo + span
    build = lambda parts: (
        DataGenerator(_spark, name="pb", rows=200, partitions=parts)
        .withColumn("x", "long", minValue=lo, maxValue=hi, step=step, random=random)
        .build()
    )
    df = build(4)
    mn, mx = df.agg(F.min("x"), F.max("x")).first()
    assert lo <= mn and mx <= hi
    # every value on the lattice lo + k*step
    off = df.select(F.sum(F.pmod(F.col("x") - lo, step)).alias("s")).first()["s"]
    assert off == 0
    # determinism + partition independence
    assert _fingerprint(build(4)) == _fingerprint(build(2))


@given(
    values=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    random=st.booleans(),
)
@settings(**_SETTINGS)
def test_values_closed_world(values, random):
    df = (
        DataGenerator(_spark, name="pbv", rows=150, partitions=3)
        .withColumn("v", "string", values=values, random=random)
        .build()
    )
    seen = {r["v"] for r in df.select("v").distinct().collect()}
    assert seen <= set(values)
    if not random and len(values) <= 150:
        assert seen == set(values)  # cycling covers every value


@given(
    p=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**_SETTINGS)
def test_null_fraction_bounds(p):
    df = (
        DataGenerator(_spark, name="pbn", rows=400, partitions=4)
        .withColumn("x", "int", minValue=0, maxValue=9, percentNulls=p, random=True)
        .build()
    )
    nulls = df.where(F.col("x").isNull()).count()
    frac = nulls / 400
    assert abs(frac - p) < 0.12  # Bernoulli(400) tolerance
    # repeatable
    df2 = (
        DataGenerator(_spark, name="pbn", rows=400, partitions=2)
        .withColumn("x", "int", minValue=0, maxValue=9, percentNulls=p, random=True)
        .build()
    )
    assert df2.where(F.col("x").isNull()).count() == nulls


@given(
    begin_day=st.integers(min_value=0, max_value=300),
    span_days=st.integers(min_value=1, max_value=60),
    random=st.booleans(),
)
@settings(**_SETTINGS)
def test_date_range_containment(begin_day, span_days, random):
    import datetime as dt

    b = dt.date(2021, 1, 1) + dt.timedelta(days=begin_day)
    e = b + dt.timedelta(days=span_days)
    df = (
        DataGenerator(_spark, name="pbd", rows=100, partitions=2)
        .withColumn("d", "date", begin=str(b), end=str(e), random=random)
        .build()
    )
    mn, mx = df.agg(F.min("d"), F.max("d")).first()
    assert b <= mn and mx <= e


@given(
    n_frac=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31),
    weights=st.lists(
        st.floats(min_value=0.01, max_value=10.0), min_size=5, max_size=5
    ),
)
@settings(**_SETTINGS)
def test_split_assign_exhaustive_and_stable(n_frac, seed, weights):
    """Every row gets exactly one label from the fraction dict, for any
    fraction shape and seed, and assignment is partitioning-independent."""
    from dbldatagen_spark.functions import split_assign

    fractions = {f"s{i}": weights[i] for i in range(n_frac)}
    df = _spark.range(300).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", fractions, seed=seed)
    rows = out.collect()
    assert len(rows) == 300
    assert {r["split"] for r in rows} <= set(fractions)
    re_rows = split_assign(
        df.repartition(7), "doc_id", fractions, seed=seed
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, re_rows))


@given(
    chunk=st.integers(min_value=2, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    n_words=st.integers(min_value=1, max_value=120),
)
@settings(**_SETTINGS)
def test_chunk_documents_covers_every_token(chunk, overlap_frac, n_words):
    """Chunks cover the whole document: with overlap o, consecutive chunk
    starts advance by chunk-o, the final chunk reaches the last token,
    and at overlap 0 the chunks reassemble the document exactly."""
    from dbldatagen_spark.functions import chunk_documents

    overlap = int(chunk * overlap_frac)
    text = " ".join(f"w{i}" for i in range(n_words))
    df = _spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=chunk,
                        overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    step = chunk - overlap
    assert rows[0]["chunk_idx"] == 0
    assert all(r["n_tokens"] >= 1 for r in rows)
    # the last chunk's final token is the document's final token
    assert rows[-1]["chunk_text"].split()[-1] == f"w{n_words - 1}"
    if overlap == 0:
        rebuilt = " ".join(r["chunk_text"] for r in rows)
        assert rebuilt == text
    # coverage: starts advance by `step`, so token (n_words-1) is inside
    # the last window
    assert (len(rows) - 1) * step <= n_words - 1


@given(
    k=st.integers(min_value=1, max_value=4),
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30), min_size=1, max_size=8
    ),
)
@settings(**_SETTINGS)
def test_token_vocabulary_counts_total(k, texts):
    """Vocabulary counts sum to the corpus token total (no token lost or
    double-counted), regardless of text shape."""
    from dbldatagen_spark.functions import token_vocabulary

    df = _spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = token_vocabulary(df, "text", top_k=10_000)
    got = sum(r["n_occurrences"] for r in out.collect())
    expected = sum(len(t.split()) for t in texts)
    assert got == expected


_TEMPLATE_TOKENS = ["d", "D", "a", "A", "x", "X", "k", "K", r"\n", r"\N", r"\w", r"\W", "-", ".", "_"]


@given(
    parts=st.lists(st.sampled_from(_TEMPLATE_TOKENS), min_size=1, max_size=8),
    n_alts=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_template_expr_matches_udf_shape(parts, n_alts, seed):
    """For any template, the pure-Catalyst path and the pandas-UDF path
    produce strings matching the same shape regex, and the expr path is
    partition-independent."""
    import re

    from dbldatagen_spark import TemplateGenerator

    template = "|".join("".join(parts) for _ in range(n_alts))

    # shape regex for one alternative
    piece = {
        "d": r"\d", "D": r"[1-9]", "a": r"[a-z]", "A": r"[A-Z]",
        "x": r"[0-9a-f]", "X": r"[0-9A-F]", "k": r"[a-z0-9]", "K": r"[A-Z0-9]",
        r"\n": r"\d{1,3}", r"\N": r"\d{1,5}", r"\w": r"[a-z]+", r"\W": r"[A-Z][a-z]+",
        "-": "-", ".": r"\.", "_": "_",
    }
    alt_re = "".join(piece[p] for p in parts)
    full = re.compile(f"^({alt_re})$")

    def build(mode, partitions):
        return (
            DataGenerator(_spark, rows=60, partitions=partitions, randomSeed=seed)
            .withColumn("t", "string", text=TemplateGenerator(template, mode=mode))
            .build()
        )

    for mode in ("expr", "udf"):
        vals = [r["t"] for r in build(mode, 2).collect()]
        bad = [v for v in vals if not full.match(v)]
        assert not bad, f"mode={mode} template={template!r} bad={bad[:3]}"
    assert _fingerprint(build("expr", 2)) == _fingerprint(build("expr", 5))


@given(
    texts=st.lists(
        st.text(
            alphabet="ab @.-()0123456789\n",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_pii_patterns_portable_across_engines(texts):
    """The PII regexes must mean the same thing to Java (Spark) and RE2
    (DuckDB): for arbitrary digit/@/paren soup, redacted text and match
    counts agree engine-for-engine."""
    import duckdb

    from dbldatagen_spark.functions import redact_pii

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = _spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["redacted"], r["n_email"], r["n_ssn"], r["n_phone"],
                      r["n_ipv4"], r["n_credit_card"])
        for r in redact_pii(sdf, "doc_id", "text").collect()
    }

    from dbldatagen_spark.functions.pii import PII_PATTERNS

    redacted = "text"
    counts = []
    for _kind, (pattern, token) in PII_PATTERNS.items():
        p = pattern.replace("'", "''")
        redacted = f"regexp_replace({redacted}, '{p}', '{token}', 'g')"
        counts.append(f"len(regexp_extract_all(text, '{p}'))")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oracle = con.execute(
        f"SELECT doc_id, {redacted}, {', '.join(counts)} FROM docs"
    ).fetchall()
    for doc_id, *vals in oracle:
        assert got[doc_id] == tuple(vals), (
            f"engine divergence on {texts[doc_id]!r}: "
            f"spark={got[doc_id]} duckdb={tuple(vals)}"
        )


def test_pii_ipv4_octet_and_phone_paren_semantics():
    """Hardened classes: only real 0-255 octets form an [IP]; mismatched
    parens / mid-number starts are not a [PHONE] (matching behavior must be
    identical in both engines — covered by the property test above; here
    the intended semantics themselves)."""
    from dbldatagen_spark.functions import redact_pii

    cases = [
        ("connect to 10.0.0.255 now", "connect to [IP] now"),
        ("v1.2.3.4 tag", "v1.2.3.4 tag"),  # no \b after a word char
        ("release 1.2.3.4 done", "release [IP] done"),  # valid-octet quad
        ("build 10.300.1.2 shipped", "build 10.300.1.2 shipped"),
        ("octets 999.1.1.1 stay", "octets 999.1.1.1 stay"),
        ("call (555) 123-4567 ok", "call [PHONE] ok"),
        ("call 555-123-4567 ok", "call [PHONE] ok"),
        ("weird 555) 123-4567 stays", "weird 555) 123-4567 stays"),
        ("id 0555 123-4567 stays", "id 0555 123-4567 stays"),
    ]
    sdf = _spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["redacted"]
        for r in redact_pii(sdf, "doc_id", "text", counts=False).collect()
    }
    for i, (src, want) in enumerate(cases):
        assert got[i] == want, f"{src!r}: got {got[i]!r}, want {want!r}"


@given(
    texts=st.lists(
        st.text(
            alphabet="ab \t\n\x07‘’“”– …x.",
            min_size=0,
            max_size=50,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_normalize_text_idempotent_and_engine_portable(texts):
    """normalize_text is a projection onto its own fixed-point set
    (normalize(normalize(x)) == normalize(x)) and agrees with the
    DuckDB rendering of the same pattern chain."""
    import duckdb

    from dbldatagen_spark.functions import normalize_text
    from dbldatagen_spark.functions.curation import (
        CONTROL_CHARS_PATTERN,
        NORMALIZE_TRANSLATE_DST,
        NORMALIZE_TRANSLATE_SRC,
        WHITESPACE_RUN_PATTERN,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = _spark.createDataFrame(rows, ["doc_id", "text"])
    once = {
        r["doc_id"]: r["normalized_text"]
        for r in normalize_text(sdf, "doc_id", "text").collect()
    }
    again_df = _spark.createDataFrame(
        [(i, t) for i, t in once.items()], ["doc_id", "text"]
    )
    twice = {
        r["doc_id"]: r["normalized_text"]
        for r in normalize_text(again_df, "doc_id", "text").collect()
    }
    assert twice == once  # idempotent

    def q(s):
        return s.replace("'", "''")

    t = f"regexp_replace(text, '{q(CONTROL_CHARS_PATTERN)}', '', 'g')"
    t = (f"translate({t}, '{q(NORMALIZE_TRANSLATE_SRC)}', "
         f"'{q(NORMALIZE_TRANSLATE_DST)}')")
    t = f"regexp_replace({t}, '…', '...', 'g')"
    t = f"regexp_replace({t}, '{q(WHITESPACE_RUN_PATTERN)}', ' ', 'g')"
    t = f"regexp_replace({t}, ' ?\\n ?', chr(10), 'g')"
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oracle = dict(con.execute(f"SELECT doc_id, trim({t}) FROM docs").fetchall())
    assert once == oracle  # engine-portable


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc ", min_size=0, max_size=8),
            min_size=0, max_size=5,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_dedup_lines_idempotent_and_conservative(docs):
    """dedup_lines_corpus is idempotent, never invents lines, and keeps
    exactly one copy of every distinct non-blank trimmed line."""
    from dbldatagen_spark.functions import dedup_lines_corpus

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    sdf = _spark.createDataFrame(rows, ["doc_id", "text"])
    once = {
        r["doc_id"]: r["deduped_text"]
        for r in dedup_lines_corpus(sdf, "doc_id", "text").collect()
    }
    # idempotent: running again removes nothing more
    again = _spark.createDataFrame(
        [(i, t) for i, t in once.items()], ["doc_id", "text"]
    )
    out2 = dedup_lines_corpus(again, "doc_id", "text")
    assert out2.agg({"n_lines_removed": "sum"}).first()[0] in (0, None)

    # every distinct non-blank trimmed line survives exactly once
    survivors = [
        ln.strip()
        for t in once.values()
        for ln in t.split("\n")
        if ln.strip()
    ]
    originals = {
        ln.strip() for _, t in rows for ln in t.split("\n") if ln.strip()
    }
    assert set(survivors) == originals
    assert len(survivors) == len(set(survivors))


@given(
    max_tokens=st.integers(min_value=1, max_value=500),
    num_shards=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
    counts=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_pack_sequences_conservation_and_span(max_tokens, num_shards, seed, counts):
    """Packing is a permutation: every doc appears once, per-shard offsets
    are a gapless prefix sum (conservation), and the sequence span
    arithmetic is exact for any (max_tokens, count) combination."""
    from dbldatagen_spark.functions import pack_sequences

    df = _spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(
        df, "doc_id", "n_tok", max_tokens, num_shards=num_shards, seed=seed
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(counts)))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for docs in by_shard.values():
        docs.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in docs:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]
            assert r["first_seq"] == r["start_offset"] // max_tokens
            if r["n_tokens"]:
                assert r["last_seq"] == (r["start_offset"] + r["n_tokens"] - 1) // max_tokens
            else:
                assert r["last_seq"] == r["first_seq"]
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1


@given(
    rate=st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
    seed=st.integers(min_value=0, max_value=2**31),
    n=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_mix_corpus_multiplicity_bounds(rate, seed, n):
    """Every row's multiplicity is floor(rate) or ceil(rate); epoch indices
    are dense 0..copies-1; rows of unlisted sources never appear."""
    import math

    from dbldatagen_spark.functions import mix_corpus

    df = _spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(n)],
        "doc_id long, src string",
    )
    out = mix_corpus(df, "doc_id", "src", {"a": rate}, seed=seed).collect()
    assert all(r["src"] == "a" for r in out)
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
    lo, hi = math.floor(rate), math.ceil(rate)
    for doc_id, epochs in per.items():
        assert len(epochs) in (lo, hi) and len(epochs) > 0
        assert sorted(epochs) == list(range(len(epochs)))
    for doc_id in range(0, n, 2):
        if doc_id not in per:
            assert lo == 0  # absent only when downsampling can drop


@given(
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    n_frames=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_ppm_image_and_video_roundtrip_exact(h, w, n_frames, seed):
    """encode -> decode is the identity for any frame dimensions and
    pixel content, for single images and multi-frame streams."""
    import numpy as np

    from dbldatagen_spark.functions.multimodal import (
        decode_ppm,
        decode_ppm_video,
        encode_ppm,
        encode_ppm_video,
    )

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    assert (decode_ppm(encode_ppm(frames[0])) == frames[0]).all()
    dec = decode_ppm_video(encode_ppm_video(frames))
    assert len(dec) == n_frames
    assert all((a == b).all() for a, b in zip(frames, dec))


@given(
    n=st.integers(min_value=0, max_value=2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_wav_roundtrip_exact(n, rate, seed):
    """WAV encode -> decode is the identity for any PCM16 content
    including boundary samples and zero-length clips."""
    import numpy as np

    from dbldatagen_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
    dec, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert len(dec) == n and (dec == samples).all()


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    th=st.integers(min_value=1, max_value=12),
    tw=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_ppm_resize_nearest_neighbor_property(h, w, th, tw, seed):
    """Resize output pixel (y, x) equals source pixel
    (y*h//th, x*w//tw) for ANY source/target geometry."""
    import numpy as np

    from dbldatagen_spark.functions.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # apply the same mapping the operator uses, via a local re-decode
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    resized = px[ys][:, xs]
    assert resized.shape == (th, tw, 3)
    for y in (0, th - 1):
        for x in (0, tw - 1):
            assert (resized[y, x] == px[(y * h) // th, (x * w) // tw]).all()
    # and the payload roundtrip preserves it exactly
    assert (decode_ppm(encode_ppm(resized)) == resized).all()


# --- pipeline-operator invariants (round 5 additions) ---


@given(
    n_rows=st.integers(min_value=1, max_value=60),
    cap=st.integers(min_value=1, max_value=12),
    n_groups=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_quota_sample_invariants(n_rows, cap, n_groups):
    from dbldatagen_spark.functions import quota_sample

    rows = [(i, f"g{i % n_groups}") for i in range(n_rows)]
    df = _spark.createDataFrame(rows, ["id", "g"])
    out = quota_sample(df, "g", "id", cap).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, set()).add(r.id)
    sizes = {g: len(ids) for g, ids in by_g.items()}
    # per-group cap holds; groups at or under the cap pass through whole
    for g in {f"g{i % n_groups}" for i in range(n_rows)}:
        orig = sum(1 for i in range(n_rows) if f"g{i % n_groups}" == g)
        assert sizes.get(g, 0) == min(cap, orig)
    # partitioning invariance
    out2 = quota_sample(df.repartition(5), "g", "id", cap).collect()
    assert {(r.g, r.id) for r in out} == {(r.g, r.id) for r in out2}


@given(
    weights=st.lists(
        st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    budget=st.floats(min_value=0.5, max_value=500.0, allow_nan=False),
)
@settings(**_SETTINGS)
def test_budget_select_prefix_invariant(weights, budget):
    from dbldatagen_spark.functions import budget_select

    rows = [("g", i, float(w)) for i, w in enumerate(weights)]
    df = _spark.createDataFrame(rows, ["g", "id", "w"])
    kept = sorted(
        budget_select(df, "g", "id", "w", budget).collect(),
        key=lambda r: r.cum_weight,
    )
    # kept set is exactly the longest affordable priority prefix
    order = sorted(rows, key=lambda t: (-t[2], t[1]))
    cum, expect = 0.0, []
    for _, i, w in order:
        cum += w
        if cum > budget:
            break
        expect.append(i)
    assert [r.id for r in kept] == expect


@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_apply_cdc_equals_sequential_replay(ops):
    from dbldatagen_spark.functions import apply_cdc

    rows = [(k, seq, op, f"v{seq}") for seq, (k, op) in enumerate(ops)]
    df = _spark.createDataFrame(rows, ["k", "seq", "op", "payload"])
    got = {r.k: r.payload for r in apply_cdc(df, ["k"], "seq").collect()}
    # sequential replay reference
    state = {}
    for k, seq, op, payload in rows:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = payload
    # apply_cdc keeps a key iff its LAST op is not a delete — replay agrees
    assert got == state


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=4,
        max_size=60,
    ),
    nb=st.integers(min_value=2, max_value=8),
)
@settings(**_SETTINGS)
def test_quantile_bucket_monotone(vals, nb):
    from dbldatagen_spark.functions import quantile_bucket

    df = _spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["id", "v"]
    )
    out = sorted(quantile_bucket(df, "v", nb).collect(), key=lambda r: r.v)
    # bucket is monotone in value and within [1, nb]; ties share buckets
    buckets = [r.v_bucket for r in out]
    assert buckets == sorted(buckets)
    assert 1 <= min(buckets) and max(buckets) <= nb
    by_val = {}
    for r in out:
        by_val.setdefault(r.v, set()).add(r.v_bucket)
    assert all(len(s) == 1 for s in by_val.values())


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1, max_size=30,
    ),
    alpha_pct=st.integers(min_value=1, max_value=100),
)
@settings(**_SETTINGS)
def test_ewma_matches_python_reference(vals, alpha_pct):
    """Spark's F.aggregate EWMA fold must equal a plain-Python replay
    bit-for-bit for any value sequence and alpha."""
    from dbldatagen_spark.functions import ewma

    alpha = alpha_pct / 100.0
    df = _spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "k string, oid long, v double",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")))
    got = {r.oid: r.ewma for r in
           ewma(df, "k", "ts", "v", alpha=alpha, order_col="oid").collect()}
    s = None
    for i, v in enumerate(vals):
        s = v if s is None else alpha * v + (1.0 - alpha) * s
        assert got[i] == s, (i, got[i], s)


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50),
                  min_size=1, max_size=60),
    width=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_cms_estimate_never_undershoots(vals, width):
    from collections import Counter

    from dbldatagen_spark.functions import cms_estimate, cms_sketch

    df = _spark.createDataFrame([(int(v),) for v in vals], "v int")
    sk = cms_sketch(df, "v", width=width, depth=3)
    est = {r.v: r.cms_count for r in
           cms_estimate(sk, df, "v", width=width, depth=3).collect()}
    exact = Counter(vals)
    for v, c in exact.items():
        assert est[v] >= c, (v, est[v], c)


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=1, max_size=40,
    ),
    split=st.integers(min_value=0, max_value=39),
)
@settings(**_SETTINGS)
def test_histogram_merge_equals_whole(vals, split):
    from dbldatagen_spark.functions import histogram_merge, histogram_sketch

    split = min(split, len(vals))
    a = _spark.createDataFrame([(float(v),) for v in vals[:split]] or [(None,)],
                               "v double")
    b = _spark.createDataFrame([(float(v),) for v in vals[split:]] or [(None,)],
                               "v double")
    whole = _spark.createDataFrame([(float(v),) for v in vals], "v double")
    kw = dict(lo=0.0, hi=100.0, bins=16)
    merged = histogram_merge(
        [histogram_sketch(a, "v", **kw), histogram_sketch(b, "v", **kw)]
    )
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, histogram_sketch(whole, "v", **kw).collect()))


@given(
    n=st.integers(min_value=1, max_value=4000),
    stride=st.integers(min_value=1, max_value=97),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_hll_estimate_and_merge_properties(n, stride, parts):
    # for ANY distinct-int set: the estimate stays within a generous
    # error envelope (theoretical sigma at m=256 is ~6.5%), and
    # merging ANY partition of the set reproduces the direct registers
    # exactly (element-wise-max union law)
    from dbldatagen_spark.functions import hll_merge_expr, hll_sketch

    df = _spark.range(0, n).select((F.col("id") * stride).alias("v"))
    direct = hll_sketch(df, "v", p=8).collect()[0]
    est = direct["dv_estimate"]
    assert abs(est / n - 1.0) < 0.3, (n, est)

    split = df.withColumn("part", F.col("v") % parts)
    merged = (
        hll_sketch(split, "v", group_cols=["part"], p=8)
        .agg(F.collect_list("registers").alias("s"))
        .select(hll_merge_expr(F.col("s"), p=8).alias("m"))
        .collect()[0]["m"]
    )
    assert list(merged) == list(direct["registers"])


@given(
    n=st.integers(min_value=1, max_value=300),
    k=st.integers(min_value=1, max_value=20),
    wmod=st.integers(min_value=1, max_value=50),
)
@settings(**_SETTINGS)
def test_priority_sample_estimator_contract(n, k, wmod):
    # DLT contract for ANY (n, k, weights): tau is the (k+1)-th
    # priority (0 in the exact regime), the sample is exactly the
    # top-min(k, n) by priority, and w_hat = max(w, tau); in the exact
    # regime (n <= k) the estimator is the identity
    import hashlib

    from dbldatagen_spark.functions import priority_sample

    df = _spark.range(0, n).select(
        F.col("id"), (F.col("id") % wmod + 1).cast("double").alias("w")
    )
    got = {r["id"]: r for r in priority_sample(df, "id", "w", k).collect()}

    def u(i):
        hv = int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16)
        return (hv + 1) / float(1 << 60)

    pri = sorted(
        ((float(i % wmod + 1) / u(i), i) for i in range(n)),
        key=lambda t: (-t[0], t[1]),
    )
    tau = pri[k][0] if n > k else 0.0
    expect = {i for _, i in pri[:k]}
    assert set(got) == expect
    for i, r in got.items():
        assert r["tau"] == tau
        assert r["w_hat"] == max(r["weight"], tau)
        if n <= k:
            assert r["w_hat"] == r["weight"]


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),   # offset seconds
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    step=st.sampled_from([60, 300, 900]),
)
@settings(**_SETTINGS)
def test_resample_interpolate_bracket_property(data, step):
    # every emitted grid value lies within [min, max] of its bracketing
    # observations (linear interpolation never over/undershoots), and
    # exact hits return the observation value
    from dbldatagen_spark.functions import resample_interpolate

    base = 1704067200  # 2024-01-01 00:00:00 UTC
    rows = [(1, t + base, float(v), i) for i, (t, v) in enumerate(data)]
    df = _spark.createDataFrame(
        rows, "k long, te long, v double, eid long"
    ).select("k", F.to_timestamp(F.col("te")).alias("ts"), "v", "eid")
    out = resample_interpolate(
        df, "k", "ts", "v", interval_seconds=step, order_col="eid"
    ).collect()
    obs = sorted((t + base, v) for t, v in data)
    import bisect

    for r in out:
        g = int(r["grid_ts"].replace(tzinfo=__import__("datetime").timezone.utc).timestamp())
        assert obs[0][0] <= g <= obs[-1][0]  # never extrapolates
        j = bisect.bisect_right([t for t, _ in obs], g)
        lo = obs[j - 1]
        if lo[0] == g:
            assert r["v"] == lo[1]
            assert r["was_exact"]
        else:
            hi = obs[j]
            lo_v, hi_v = sorted((lo[1], hi[1]))
            assert lo_v - 1e-9 <= r["v"] <= hi_v + 1e-9
            assert not r["was_exact"]


@given(
    masses=st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1,
        max_size=8,
    ),
    budget=st.integers(min_value=0, max_value=10_000_000),
    alpha=st.sampled_from([0.0, 0.5, 1.0]),
)
@settings(**_SETTINGS)
def test_token_allocation_sums_exactly_and_is_fair(masses, budget, alpha):
    """Largest-remainder invariants for temperature_token_allocation:
    the allocation sums to the budget EXACTLY whenever any group has
    mass (Hamilton apportionment never over- or under-fills), every
    share is within 1 unit of its real-valued quota (the rule's
    defining fairness property), and the result is identical under
    different partitioning."""
    import math

    from dbldatagen_spark.functions import temperature_token_allocation

    rows = [(f"g{i:02d}", int(m)) for i, m in enumerate(masses)]
    df = _spark.createDataFrame(rows, "grp string, tok long")
    out = {
        r["grp"]: r
        for r in temperature_token_allocation(
            df.repartition(3), "grp", "tok",
            alpha=alpha, target_tokens=budget,
        ).collect()
    }
    assert set(out) == {g for g, _ in rows}
    total = sum(r["target_tokens"] for r in out.values())
    if alpha == 0.0 or any(m > 0 for m in masses):
        assert total == budget
    else:
        assert total == 0  # degenerate all-zero corpus under-fills
    # quota fairness: |target - budget*weight| < 1 for every group
    for r in out.values():
        assert abs(r["target_tokens"] - budget * r["weight"]) < 1.0
    # partition independence
    again = {
        r["grp"]: r["target_tokens"]
        for r in temperature_token_allocation(
            df.repartition(7), "grp", "tok",
            alpha=alpha, target_tokens=budget,
        ).collect()
    }
    assert again == {g: r["target_tokens"] for g, r in out.items()}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=15,
    ),
    iterations=st.integers(min_value=1, max_value=4),
    weighted=st.booleans(),
)
@settings(**_SETTINGS)
def test_pagerank_matches_independent_replay(edges, iterations, weighted):
    """Fixed-point PageRank's whole claim is bit-exact replayability:
    for random small digraphs (parallel edges, self-loops, dangling
    nodes all drawn naturally), the Spark ranks must equal a
    from-scratch Python replay of the documented integer recurrence,
    weighted and unweighted."""
    from dbldatagen_spark.functions import pagerank

    df = _spark.createDataFrame(
        [(f"n{s}", f"n{d}", w) for s, d, w in edges],
        "s string, d string, w long",
    )
    out = pagerank(
        df, "s", "d",
        weight_col="w" if weighted else None,
        iterations=iterations,
    )
    got = {r["node"]: r["rank_units"] for r in out.collect()}

    # independent replay of the documented recurrence
    scale, dp = 10**12, 850_000
    agg = {}
    for s, d, w in edges:
        key = (f"n{s}", f"n{d}")
        agg[key] = agg.get(key, 0) + (w if weighted else 0)
    if not weighted:
        agg = {k: 1 for k in agg}
    nodes = sorted({x for k in agg for x in k})
    n = len(nodes)
    W = {}
    for (s, _), w in agg.items():
        W[s] = W.get(s, 0) + w
    u = {x: scale // n for x in nodes}
    base = (scale // n) * (1_000_000 - dp) // 1_000_000
    for _ in range(iterations):
        nu = {x: base for x in nodes}
        for (s, t), w in agg.items():
            damped = (u[s] * dp) // 1_000_000
            nu[t] += (damped // W[s]) * w + ((damped % W[s]) * w) // W[s]
        u = nu
    assert got == u


@given(
    scores=st.lists(
        st.one_of(
            st.none(),
            st.just(float("nan")),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=25,
    ),
    n_buckets=st.integers(min_value=2, max_value=5),
    n_bins=st.integers(min_value=5, max_value=64),
    num_shards=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=99),
    easy_high=st.booleans(),
)
@settings(**_SETTINGS)
def test_curriculum_order_matches_independent_replay(
    scores, n_buckets, n_bins, num_shards, seed, easy_high
):
    """curriculum_order's claim is any-engine replayability of the
    ENTIRE assignment: for random score frames (NULL/NaN drawn
    naturally) the (band, shard, position) triple must equal a
    from-scratch Python replay of the documented histogram bucketing
    + md5 arithmetic + in-band ordering."""
    import hashlib
    import math

    from dbldatagen_spark.functions import curriculum_order

    rows = [(i, s) for i, s in enumerate(scores)]
    df = _spark.createDataFrame(rows, "id long, s double")
    got = {r["id"]: (r["difficulty"], r["shard"], r["position"])
           for r in curriculum_order(
               df, "id", "s", n_buckets=n_buckets, n_bins=n_bins,
               num_shards=num_shards, seed=seed, hash_mode="md5",
               easy_high=easy_high,
           ).collect()}

    valid = {i: s for i, s in rows
             if s is not None and not math.isnan(s)}
    if valid:
        lo, hi = min(valid.values()), max(valid.values())
        span = hi - lo

        def _bin(s):
            if span > 0:
                return min(n_bins - 1,
                           max(0, math.floor((s - lo) / span * n_bins)))
            return 0

        bins = {i: _bin(s) for i, s in valid.items()}
        n = len(valid)
        hist = {}
        for b in bins.values():
            hist[b] = hist.get(b, 0) + 1
        thresholds = []
        for k in range(1, n_buckets):
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum >= math.ceil(n * k / n_buckets):
                    thresholds.append(b)
                    break
        expected = {}
        per = {}
        for i in sorted(valid):
            bucket = 1 + sum(1 for t in thresholds if bins[i] > t)
            band = n_buckets + 1 - bucket if easy_high else bucket
            h = hashlib.md5(f"{seed}-{i}".encode()).hexdigest()
            shard = int(h[:15], 16) % num_shards
            ordk = hashlib.md5(f"{seed + 1}-{i}".encode()).hexdigest()
            per.setdefault((band, shard), []).append((ordk, i, band, shard))
        for key, lst in per.items():
            lst.sort()
            for pos, (_, i, band, shard) in enumerate(lst):
                expected[i] = (band, shard, pos)
        for i in valid:
            assert got[i] == expected[i], (i, got[i], expected[i])
    for i, s in rows:
        if i not in valid:
            assert got[i] == (None, None, None)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=12,
    ),
    bench=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=4,
    ),
    n=st.integers(min_value=2, max_value=4),
    min_shared=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(**_SETTINGS)
def test_contamination_split_matches_independent_replay(
    docs, bench, n, min_shared, seed
):
    """contamination_aware_split must replay exactly: the provisional
    md5 split, the distinct-shared-n-gram count against the benchmark
    gram set, and the quarantine reroute — for random tiny-vocab
    corpora where overlaps occur naturally."""
    import hashlib

    from dbldatagen_spark.functions import contamination_aware_split

    fr = {"train": 0.7, "val": 0.2, "test": 0.1}
    corpus = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = _spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = _spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(bench)],
        "bid long, btext string",
    )
    got = {r["doc_id"]: (r["split"], r["n_shared_ngrams"])
           for r in contamination_aware_split(
               df, "doc_id", "text", bdf, fr,
               bench_text_col="btext", n=n, min_shared=min_shared,
               seed=seed, hash_mode="md5",
           ).collect()}

    def grams(ws):
        ws = [w for w in " ".join(ws).lower().split() if w]
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)} \
            if len(ws) >= n else set()

    bgrams = set()
    for ws in bench:
        bgrams |= grams(ws)
    for i, ws in enumerate(docs):
        shared = len(grams(ws) & bgrams)
        h = hashlib.md5(f"{seed}-{i}".encode()).hexdigest()
        b = int(h[:15], 16) % 1_000_000
        label = ("train" if b < 700_000
                 else "val" if b < 900_000 else "test")
        if shared >= min_shared:
            assert got[i] == ("quarantined", shared), (i, got[i], shared)
        else:
            assert got[i] == (label, None), (i, got[i], label)


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet="abcdr eth ",
                min_size=0, max_size=30,
            ),
        ),
        min_size=1, max_size=10,
    ),
    n_merges=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_tokenizer_fertility_matches_independent_replay(texts, n_merges):
    """tokenizer_fertility's counts and both ratios must replay from
    scratch: greedy leftmost merge application per word, exact long
    sums, one IEEE division each."""
    import re

    from dbldatagen_spark.functions import tokenizer_fertility

    MERGES = [("t", "h"), ("th", "e"), ("a", "b"), ("ab", "c"),
              ("c", "d"), ("e", "r")][:n_merges]
    df = _spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    r = tokenizer_fertility(df, "text", MERGES).collect()[0]

    def enc(word):
        seq = "".join(" " + c for c in word)
        for l_s, r_s in MERGES:
            seq = seq.replace(f" {l_s} {r_s}", f" {l_s}{r_s}")
        return [t for t in seq.split(" ") if t]

    nw = nc = nt = 0
    for t in texts:
        if t is None:
            continue
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                nw += 1
                nc += len(w)
                nt += len(enc(w))
    assert (r["n_docs"], r["n_words"], r["n_chars"], r["n_tokens"]) == \
        (len(texts), nw, nc, nt)
    assert r["tokens_per_word"] == (nt / nw if nw else None)
    assert r["chars_per_token"] == (nc / nt if nt else None)


@given(
    scores=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=40,
    ),
    ref_scores=st.lists(
        st.integers(min_value=0, max_value=100), min_size=1, max_size=25
    ),
    n_bins=st.integers(min_value=1, max_value=6),
    scale_ppm=st.integers(min_value=1, max_value=1_000_000),
)
@settings(**_SETTINGS)
def test_distribution_match_matches_independent_replay(
    scores, ref_scores, n_bins, scale_ppm
):
    """The histogram-matching contract is integer-exact and documented
    operation-for-operation: for random corpora (NULL scores included)
    and references, the Spark bin/rate/keep flags must equal a
    from-scratch Python replay — float bin arithmetic in the same IEEE
    op order, big-int floor rates, and the md5 bucket recomputed with
    hashlib."""
    import math
    from hashlib import md5

    from hypothesis import assume

    assume(any(s is not None for s in scores))
    from dbldatagen_spark.functions import distribution_matched_sample

    df = _spark.createDataFrame(
        [(i, float(s) if s is not None else None)
         for i, s in enumerate(scores)],
        "id long, s double",
    )
    ref = _spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(ref_scores)],
        "rid long, s double",
    )
    got = {
        r["id"]: (r["match_bin"], r["match_rate_ppm"], r["match_keep"])
        for r in distribution_matched_sample(
            df, "id", "s", ref, n_bins=n_bins, scale_ppm=scale_ppm,
            seed=99, hash_mode="md5",
        ).collect()
    }

    # independent replay
    valid = [float(s) for s in scores if s is not None]
    rvals = [float(s) for s in ref_scores]
    lo = min(min(valid), min(rvals))
    hi = max(max(valid), max(rvals))
    span = hi - lo

    def _bin(s):
        if span <= 0:
            return 0
        return min(n_bins - 1, math.floor((s - lo) / span * n_bins))

    c_hist, r_hist = {}, {}
    for s in valid:
        c_hist[_bin(s)] = c_hist.get(_bin(s), 0) + 1
    for s in rvals:
        r_hist[_bin(s)] = r_hist.get(_bin(s), 0) + 1
    C, R = sum(c_hist.values()), sum(r_hist.values())
    rates = {}
    for b in range(n_bins):
        c_b, r_b = c_hist.get(b, 0), r_hist.get(b, 0)
        rates[b] = (
            0 if c_b == 0 or r_b == 0
            else min(1_000_000, (scale_ppm * r_b * C) // (R * c_b))
        )
    for i, s in enumerate(scores):
        bucket = int(
            md5(f"99-{i}".encode()).hexdigest()[:15], 16
        ) % 1_000_000
        if s is None:
            assert got[i] == (None, 0, False)
        else:
            b = _bin(float(s))
            assert got[i] == (b, rates[b], bucket < rates[b]), (
                i, s, got[i], b, rates[b], bucket,
            )


@given(
    links=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # src host index
            st.integers(min_value=0, max_value=4),   # dst host index
            st.one_of(
                st.none(), st.sampled_from(["A", "b  C", "  ", "b c"])
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    keep_self=st.booleans(),
)
@settings(**_SETTINGS)
def test_anchor_profile_matches_independent_replay(links, keep_self):
    """Per-target-host anchor aggregation replayed from scratch:
    normalization (lower/trim/whitespace-collapse), NULL/blank and
    self-link drops, exact counts, and the (count desc, anchor asc)
    top-anchor argmin must all match pure-Python truth."""
    import re as _re

    from dbldatagen_spark.functions import anchor_text_profile

    df = _spark.createDataFrame(
        [(f"https://h{s}.com/{i}", f"https://h{d}.com/{i}", a)
         for i, (s, d, a) in enumerate(links)],
        "su string, du string, a string",
    )
    got = {
        r["host"]: (
            r["in_links"], r["referring_hosts"], r["unique_anchors"],
            r["top_anchor"], r["top_anchor_links"],
        )
        for r in anchor_text_profile(
            df, "su", "du", "a", keep_self_links=keep_self
        ).collect()
    }

    # independent replay
    pa, srcs = {}, {}
    for s, d, a in links:
        if a is None:
            continue
        norm = _re.sub(r"\s+", " ", a.strip().lower())
        if not norm:
            continue
        if not keep_self and s == d:
            continue
        dst = f"h{d}.com"
        pa.setdefault(dst, {})
        pa[dst][norm] = pa[dst].get(norm, 0) + 1
        srcs.setdefault(dst, set()).add(f"h{s}.com")
    want = {}
    for dst, anchors in pa.items():
        top = min(anchors.items(), key=lambda kv: (-kv[1], kv[0]))
        want[dst] = (
            sum(anchors.values()), len(srcs[dst]), len(anchors),
            top[0], top[1],
        )
    assert got == want


@given(
    n_docs=st.integers(min_value=5, max_value=40),
    pair_list=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=25,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_cluster_aware_split_colocates_every_component(
    n_docs, pair_list, seed
):
    """cluster_aware_split's claim: any two documents connected
    through the pair graph — at ANY hop distance — land in the same
    split, and untouched documents get exactly the split_assign
    label.  Replayed against an independent Python union-find."""
    from dbldatagen_spark.functions import cluster_aware_split, split_assign

    pair_list = [(a, b) for a, b in pair_list
                 if a != b and a < n_docs and b < n_docs]
    if not pair_list:
        pair_list = [(0, min(1, n_docs - 1))]
    docs = _spark.createDataFrame(
        [(i,) for i in range(n_docs)], "doc_id long")
    pairs = _spark.createDataFrame(pair_list, "id_a long, id_b long")
    fr = {"train": 0.7, "val": 0.15, "test": 0.15}
    out = {r["doc_id"]: r for r in cluster_aware_split(
        docs, "doc_id", fr, pairs, seed=seed).collect()}

    # independent union-find over the same pairs
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep = {i: find(i) for i in range(n_docs)}
    # min-reachable representative == split_key, co-located splits
    for i in range(n_docs):
        assert out[i]["split_key"] == rep[i], (i, rep[i])
        assert out[i]["split"] == out[rep[i]]["split"]
    # untouched docs: exact split_assign parity
    plain = {r["doc_id"]: r["split"] for r in split_assign(
        docs, "doc_id", fr, seed=seed, hash_mode="md5").collect()}
    touched = {x for p in pair_list for x in p}
    for i in range(n_docs):
        if i not in touched:
            assert out[i]["split"] == plain[i]


@given(
    groups=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            st.integers(min_value=0, max_value=30),   # words per doc
        ),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_fertility_allocation_budget_exact_and_equitable(groups, budget):
    """fertility_token_allocation's contract: target_tokens sums to
    the budget EXACTLY whenever any group has words, weights sum to
    1, and the per-word token opportunity (target / (weight-eligible
    fertility)) is equalized up to the remainder units."""
    from dbldatagen_spark.functions import fertility_token_allocation

    rows = [
        (g, " ".join(["the"] * nw) if nw else None)
        for g, nw in groups
    ]
    docs = _spark.createDataFrame(rows, "lang string, text string")
    out = fertility_token_allocation(
        docs, "lang", "text", [("t", "h")], alpha=0.5,
        target_tokens=budget,
    ).collect()
    any_words = any(nw > 0 for _, nw in groups)
    total = sum(r["target_tokens"] for r in out)
    if any_words:
        assert total == budget
        assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-9
    else:
        assert total == 0
    for r in out:
        assert r["target_tokens"] >= 0
        if r["n_words"] == 0:
            assert r["weight"] == 0.0 and r["target_tokens"] == 0


@given(
    ranks=st.lists(
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=6,
    ),
    base=st.integers(min_value=0, max_value=500_000),
    span=st.integers(min_value=0, max_value=500_000),
)
@settings(**_SETTINGS)
def test_authority_sample_ppm_bounds_and_monotone(ranks, base, span):
    """authority_weighted_sample's rate contract: keep_ppm lies in
    [base_ppm, max_ppm], the best-ranked host sits exactly at
    max_ppm, unranked hosts exactly at base_ppm, and the rate is
    monotone in rank_units."""
    from dbldatagen_spark.functions import authority_weighted_sample

    max_ppm = base + span
    auth = _spark.createDataFrame(
        [(f"h{i}.com", r) for i, r in enumerate(ranks)],
        "host string, rank_units long",
    )
    docs = _spark.createDataFrame(
        [(i, f"https://h{i}.com/x") for i in range(len(ranks))]
        + [(999, "https://unranked.net/x")],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in authority_weighted_sample(
        docs, "doc_id", "url", auth, base_ppm=base, max_ppm=max_ppm,
    ).collect()}
    mx = max(ranks)
    for i, r in enumerate(ranks):
        ppm = out[i]["auth_keep_ppm"]
        assert base <= ppm <= max_ppm
        assert ppm == base + (span * r) // mx
        if r == mx:
            assert ppm == max_ppm
    assert out[999]["auth_keep_ppm"] == base
    by_rank = sorted(
        ((r, out[i]["auth_keep_ppm"]) for i, r in enumerate(ranks))
    )
    assert all(
        a[1] <= b[1] for a, b in zip(by_rank, by_rank[1:])
    )
