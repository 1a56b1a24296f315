"""Edge-case tests for the round-3 curation operators: PII redaction,
Gopher-style quality rules, and cross-document line dedup.

(The happy path over the driver tables is already covered by
``test_oracle_parity.py``; these pin the corner semantics the oracle
corpus can't reach — empty docs, placeholder non-rematch, boilerplate
drop ordering.)
"""

from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.dedup import line_dedup
from runyoro_llm_data_pipeline_spark.operators.pii import redact_pii
from runyoro_llm_data_pipeline_spark.operators.textstats import gopher_quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_all_classes_and_no_rematch(spark):
    d = _docs(
        spark,
        [
            (1, "mail a.b+tag@ex.co or call +44 (0)20-7946 0958 now"),
            (2, "server at 192.168.0.1 and 10.0.0.255."),
            (3, "clean text, no pii, version 1.2 is fine"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 1)
    assert out[2]["redacted"] == "server at <IP> and <IP>."
    assert out[2]["n_ipv4"] == 2
    # version number "1.2" must survive: not an IP, no '+' so not a phone
    assert out[3]["redacted"] == d.filter("doc_id = 3").first()["text"]
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (0, 0, 0)


def test_redact_pii_sequential_order(spark):
    # the email's '+1555-0100' local part must be eaten by the EMAIL pass,
    # not double-counted by the PHONE pass
    d = _docs(spark, [(1, "x +1555-0100@ex.com y")])
    r = redact_pii(d).first()
    assert r["redacted"] == "x <EMAIL> y"
    assert (r["n_emails"], r["n_phones"]) == (1, 0)


def test_gopher_quality_flags(spark):
    d = _docs(
        spark,
        [
            (1, "the cat sat on a mat and it is fine today ok"),  # passes
            (2, "a b"),  # too few words
            (3, ""),  # empty: all zero features, fails
            (4, "1 2 3 4 5 6 7 8 9 10 the a of"),  # low alpha fraction
        ],
    )
    out = {r["doc_id"]: r for r in gopher_quality(d).collect()}
    assert out[1]["passes"] and out[1]["ok_alpha"] and out[1]["ok_stopwords"]
    assert not out[2]["passes"] and not out[2]["ok_words"]
    assert out[3]["n_words"] == 0 and out[3]["mean_word_len"] == 0.0
    assert not out[3]["passes"]
    assert not out[4]["ok_alpha"] and out[4]["alpha_frac"] < 0.8


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    # words_per_line=2 → lines of two words; 'x x' appears in 3 docs → drop
    d = _docs(
        spark,
        [
            (1, "x x a b"),
            (2, "x x c d"),
            (3, "x x e f"),
            (4, "g h i"),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(d, words_per_line=2).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_lines"] == 2 and out[i]["n_kept"] == 1
    assert out[1]["text_deduped"] == "a b"
    # order preserved and short tail line kept
    assert out[4]["text_deduped"] == "g h\ni"
    assert out[4]["n_kept"] == 2


def test_line_dedup_all_dropped_yields_empty_string(spark):
    d = _docs(spark, [(i, "same text") for i in range(5)])
    out = line_dedup(d, words_per_line=2).collect()
    assert all(r["text_deduped"] == "" and r["n_kept"] == 0 for r in out)
    assert {r["doc_id"] for r in out} == set(range(5))


def test_line_dedup_plan_single_agg_join(spark):
    d = _docs(spark, [(1, "a b c d")])
    plan = line_dedup(d)._jdf.queryExecution().executedPlan().toString()
    # frequency count must partial-aggregate before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_offsets_and_windows(spark):
    from runyoro_llm_data_pipeline_spark.operators.corpus import pack_sequences

    # 5 docs, 3 tokens each, window=4: stream offsets 0,3,6,9,12
    d = _docs(spark, [(i, "a b c") for i in range(5)])
    out = {r["doc_id"]: r for r in pack_sequences(d, window_tokens=4).collect()}
    assert [out[i]["start_offset"] for i in range(5)] == [0, 3, 6, 9, 12]
    # doc 1 spans tokens 3..5 → windows 0..1
    assert (out[1]["first_window"], out[1]["last_window"], out[1]["n_windows"]) == (0, 1, 2)
    # doc 2 spans 6..8 → windows 1..2
    assert (out[2]["first_window"], out[2]["last_window"]) == (1, 2)


def test_pack_sequences_bucket_invariance_and_empty_docs(spark):
    from runyoro_llm_data_pipeline_spark.operators.corpus import pack_sequences

    rows = [(i, "w " * (i % 7)) for i in range(40)]  # includes empty docs
    d = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(d, 8, n_buckets=1).collect()))
    b = sorted(map(tuple, pack_sequences(d, 8, n_buckets=5).collect()))
    c = sorted(map(tuple, pack_sequences(d, 8, n_buckets=64).collect()))
    assert a == b == c  # offsets are a pure function of the data
    empty = [t for t in a if t[1] == 0]
    assert empty and all(t[6] == 0 for t in empty)  # n_windows = 0


def test_mix_sample_rates_and_determinism(spark):
    from runyoro_llm_data_pipeline_spark.operators.corpus import mix_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sample(d, {"a": 0.5, "b": 1.0}, key="doc_id")
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert by["b"] == 2000  # rate 1.0 keeps everything
    assert abs(by["a"] - 1000) < 120  # ~0.5 within binomial noise
    # pure function of (salt, stratum, key): repartition can't move rows
    again = {
        r["doc_id"]
        for r in mix_sample(d.repartition(13), {"a": 0.5, "b": 1.0}).collect()
    }
    assert again == {r["doc_id"] for r in out.collect()}
    # unknown stratum drops by default, keeps with default_rate=1
    e = spark.createDataFrame([(1, "zz")], "doc_id long, source string")
    assert mix_sample(e, {"a": 0.5}).count() == 0
    assert mix_sample(e, {"a": 0.5}, default_rate=1.0).count() == 1


def test_decontaminate_flags_overlap(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import decontaminate

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
            (3, "quick brown fox appears again in this one"),
        ],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox is a benchmark prompt")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, min_overlap=2).collect()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 2
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_overlap"] >= 1  # shares 'quick brown fox'
    assert set(out) == {1, 2, 3}  # zero-overlap docs still reported


# ---------------------------------------------------------------- properties
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "the", ""])
_doc_texts = st.lists(
    st.lists(_word, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_doc_texts, st.integers(min_value=1, max_value=20))
def test_pack_sequences_properties(shared_spark_holder, texts, window):
    """Offsets are contiguous in order_key order, total span = token sum,
    and window spans are consistent with the offsets."""
    from runyoro_llm_data_pipeline_spark.operators.corpus import pack_sequences

    spark = shared_spark_holder
    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = sorted(
        pack_sequences(d, window_tokens=window, n_buckets=3).collect(),
        key=lambda r: r["doc_id"],
    )
    expect_start = 0
    for r in rows:
        assert r["start_offset"] == expect_start
        assert r["end_offset"] == r["start_offset"] + r["n_tokens"]
        expect_start = r["end_offset"]
        assert r["first_window"] == r["start_offset"] // window
        if r["n_tokens"] > 0:
            assert r["last_window"] == (r["end_offset"] - 1) // window
            assert r["n_windows"] == r["last_window"] - r["first_window"] + 1
        else:
            assert r["n_windows"] == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_doc_texts, st.integers(min_value=1, max_value=3))
def test_line_dedup_properties(shared_spark_holder, texts, max_freq):
    """Reassembled text is exactly the original line sequence minus lines
    whose corpus-wide frequency exceeds the cap; counters agree."""
    from collections import Counter

    from runyoro_llm_data_pipeline_spark.operators.dedup import line_dedup

    spark = shared_spark_holder
    k = 2
    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    def lines_of(t):
        w = [x for x in t.split() if x]
        return [" ".join(w[i : i + k]) for i in range(0, len(w), k)]

    freq = Counter(ln for t in texts for ln in lines_of(t))
    got = {r["doc_id"]: r for r in line_dedup(d, words_per_line=k, max_line_freq=max_freq).collect()}
    assert set(got) == set(range(len(texts)))  # total map over docs
    for i, t in enumerate(texts):
        lns = lines_of(t)
        if not lns:
            # zero-line docs come back as (0, 0, ''), not omitted
            assert tuple(got[i])[1:] == (0, 0, "")
            continue
        kept = [ln for ln in lns if freq[ln] <= max_freq]
        assert got[i]["n_lines"] == len(lns)
        assert got[i]["n_kept"] == len(kept)
        assert got[i]["text_deduped"] == "\n".join(kept)


def test_pack_windows_full_except_last(spark):
    from runyoro_llm_data_pipeline_spark.operators.corpus import pack_windows

    d = _docs(spark, [(i, "w " * (3 + i % 9)) for i in range(50)])
    rows = sorted(pack_windows(d, window_tokens=16).collect(), key=lambda r: r["window_id"])
    total = sum(3 + i % 9 for i in range(50))
    assert [r["window_id"] for r in rows] == list(range(len(rows)))
    assert all(r["n_tokens"] == 16 for r in rows[:-1])  # every window full
    assert rows[-1]["n_tokens"] == total - 16 * (len(rows) - 1)
    assert sum(r["n_tokens"] for r in rows) == total


def test_exact_dedup_keep_best_picks_longest(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import exact_dedup_keep_best
    from pyspark.sql import functions as F

    d = _docs(
        spark,
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "other longer copy")],
    )
    out = {r["text_md5"]: r for r in exact_dedup_keep_best(d).collect()}
    groups = {r["kept_doc_id"]: r["n_dups"] for r in out.values()}
    # duplicates of 'same text': equal score -> smaller doc_id wins
    assert groups[1] == 2
    # custom score: prefer HIGHER doc_id via score=doc_id
    out2 = exact_dedup_keep_best(d, score=F.col("doc_id")).collect()
    assert {r["kept_doc_id"] for r in out2} >= {2}


# ---------------------------------------------------------------- clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_connected_components_chain_converges_to_min(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # a 6-long chain (worst case for one-step union-find: a~b, b~c never
    # emitted (a,c)) plus a separate 2-cycle and an isolated pair
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 10), (20, 21)],
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10,
        20: 20, 21: 20,
    }


def test_dedup_clusters_total_map_and_singletons(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import dedup_clusters

    docs = _docs(
        spark, [(i, f"doc {i}") for i in [1, 2, 3, 7, 8, 9]]
    )
    pairs = _pairs(spark, [(2, 3), (8, 9)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    # every doc present; singletons map to themselves
    assert got == {1: 1, 2: 2, 3: 2, 7: 7, 8: 8, 9: 8}


def test_connected_components_empty_pairs(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = _pairs(spark, [])
    assert connected_components(pairs).count() == 0


def test_connected_components_long_path_log_iterations(spark):
    """Pointer jumping must collapse a 64-node path in far fewer than 63
    neighbor-min rounds — pin the O(log diameter) claim by capping
    max_iter at 10 and requiring full convergence."""
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = _pairs(spark, [(i, i + 1) for i in range(64)])
    got = connected_components(pairs, max_iter=10).collect()
    assert len(got) == 65
    assert {r["cluster_id"] for r in got} == {0}


def test_dedup_lines_in_doc_keeps_first_occurrence_order(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        dedup_lines_in_doc,
    )

    docs = spark.createDataFrame(
        [
            (0, "a\nb\na\nc\nb\na"),   # dups interleaved
            (1, "x\nx\nx"),             # all-same
            (2, ""),                    # empty text -> [''] passthrough
            (3, "only line"),           # no newline at all
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup_lines_in_doc(docs).collect()}
    assert got[0]["text_deduped"] == "a\nb\nc"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (6, 3)
    assert got[1]["text_deduped"] == "x"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (1, 1)
    assert got[2]["text_deduped"] == ""
    assert got[3]["text_deduped"] == "only line"
    assert len(got) == 4  # total map over docs


def test_tfidf_top_terms_ranking_and_determinism(spark):
    from runyoro_llm_data_pipeline_spark.operators.textstats import (
        tfidf_top_terms,
    )

    # 4 docs; "common" appears in every doc (idf = ln(1) = 0 -> never a
    # top term over rarer ones); "rare" only in doc 0.
    docs = spark.createDataFrame(
        [
            (0, "common rare rare other"),
            (1, "common other other"),
            (2, "common zebra"),
            (3, "common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k_top=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert top0[0]["term"] == "rare" and top0[0]["tf"] == 2
    # df("common") == 4 == n_docs -> score exactly 0.0, ranked below any
    # positive-idf term
    assert all(r["term"] != "common" or r["score"] == 0.0 for r in out)
    # doc 3 has only the zero-idf term; it still appears (rank 1, score 0)
    assert by_doc[3][0]["term"] == "common"
    # deterministic: rerun gives identical rows
    again = tfidf_top_terms(docs, k_top=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


_line_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", ""]), min_size=0, max_size=8
    ).map("\n".join),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_line_texts)
def test_dedup_lines_in_doc_properties(shared_spark_holder, texts):
    """Totality, idempotence, and first-occurrence semantics vs a Python
    reference over arbitrary newline-joined docs (incl. empty lines and
    empty docs)."""
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        dedup_lines_in_doc,
    )

    spark = shared_spark_holder
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dedup_lines_in_doc(docs).collect()}
    assert set(got) == set(range(len(texts)))  # total map
    for i, t in enumerate(texts):
        lines = t.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["text_deduped"] == "\n".join(kept)
    # idempotence: dedup of the deduped text changes nothing
    again = dedup_lines_in_doc(
        docs.sparkSession.createDataFrame(
            [(k, v["text_deduped"]) for k, v in got.items()],
            "doc_id long, text string",
        )
    ).collect()
    assert all(r["n_lines"] == r["n_kept"] for r in again)


def test_incremental_near_dup_finds_stored_duplicate(spark):
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        build_minhash_band_index,
        incremental_near_dup,
        doc_shingles,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    old = spark.createDataFrame(
        [(100, base), (101, "completely different historical content here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                                   # exact copy of 100
            (2, "nothing like anything stored before now"),  # no match
        ],
        "doc_id long, text string",
    )
    idx = build_minhash_band_index(old, shingles=doc_shingles(old))
    out = incremental_near_dup(
        new, index=idx, old_shingles=doc_shingles(old)
    ).collect()
    pairs = {(r["new_doc_id"], r["dup_of"]) for r in out}
    assert (1, 100) in pairs
    assert all(r["new_doc_id"] != 2 for r in out)
    r = next(r for r in out if (r["new_doc_id"], r["dup_of"]) == (1, 100))
    assert r["n_common"] == r["n_new"] == r["n_old"]  # identical shingle sets


def test_incremental_near_dup_hot_bucket_capped_at_build(spark):
    from pyspark.sql import functions as F
    from runyoro_llm_data_pipeline_spark.operators.dedup import (
        build_minhash_band_index,
    )

    # 10 identical old docs -> every band key has 10 members; cap=4 drops
    # them all from the stored index at BUILD time
    old = spark.createDataFrame(
        [(i, "same boilerplate text repeated") for i in range(10)],
        "doc_id long, text string",
    )
    idx = build_minhash_band_index(old, max_docs_per_band_key=4)
    assert idx.count() == 0
    uncapped = build_minhash_band_index(old, max_docs_per_band_key=None)
    assert uncapped.count() == 10 * 6  # n_perm=12 / band_size=2 bands each


def test_bm25_prefers_matching_docs_and_is_deterministic(spark):
    from runyoro_llm_data_pipeline_spark.operators.textstats import bm25_search

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle spark shuffle spark"),  # high tf, short
            (1, "spark appears once in a much longer document padded "
                "with many other words to inflate its length a lot"),
            (2, "no relevant words at all"),
            (3, "shuffle only"),
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, "spark shuffle", k_top=4).collect()
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids            # zero matching terms -> absent
    assert ids[0] == 0             # both terms, high tf, short doc wins
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_terms"] == 2 and by_id[3]["n_terms"] == 1
    again = bm25_search(docs, "spark shuffle", k_top=4).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_gopher_ratio_exact_at_power_of_two_word_count(spark):
    """The cume-rounding bug class, pinned: with 2^7 | n_words the exact
    rational sum_len/n_words lands on a 7th-decimal half
    (129/128 = 1.0078125) where Spark round() and DuckDB round() disagree;
    the truncating integer form must yield the same value both engines
    compute: floor(1e6 * 129/128)/1e6 = 1.007812."""
    import duckdb
    from runyoro_llm_data_pipeline_spark.operators.textstats import (
        gopher_quality,
    )

    words = ["ab"] + ["a"] * 127          # 128 words, sum_len = 129
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    row = gopher_quality(docs).collect()[0]
    assert row["n_words"] == 128
    assert row["mean_word_len"] == 1.007812  # truncated, not half-up
    con = duckdb.connect()
    ddb = con.sql(
        "SELECT CAST((1000000 * 129) // 128 AS DOUBLE) / 1000000.0"
    ).fetchone()[0]
    con.close()
    assert row["mean_word_len"] == ddb
