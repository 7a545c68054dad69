"""Text analysis operators: language-ID, quality, tokens, fingerprints."""

from __future__ import annotations

import pytest

from europarl_crawler_spark.operators import textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog went to the park in the morning"),
            (2, "der Hund und die Katze sind nicht mit der Maus zu Hause"),
            (3, "le chat et le chien sont dans la maison pour la nuit"),
            (4, "zzz qqq xxx"),
            (5, "Hello, world! This is a short test sentence."),
        ],
        "doc_id long, text string",
    )


def test_language_id(docs):
    got = {r.doc_id: r.lang_pred for r in textstats.language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_token_count(docs):
    got = {r.doc_id: r for r in textstats.token_count(docs).collect()}
    assert got[4].n_tokens == 3
    assert got[1].n_tokens == 12
    assert got[1].n_subwords_est >= got[1].n_tokens


def test_quality_score_ranges(docs):
    for r in textstats.quality_score(docs).collect():
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
    got = {r.doc_id: r.quality_score for r in textstats.quality_score(docs).collect()}
    assert got[1] > got[4]  # real sentence beats gibberish


def test_fingerprint_identical_prefix_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "abcdefghijklmnopqrstuvwxyz0123456789"),
            (2, "abcdefghijklmnopqrstuvwxyz9876543210"),  # shared 26-char prefix
            (3, "totally unrelated content here with no common substring"),
        ],
        "doc_id long, text string",
    )
    fp = textstats.fingerprint(docs, n=8, window=4)
    sets = {
        d: {r.fp_hash for r in fp.filter(f"doc_id = {d}").collect()} for d in (1, 2, 3)
    }
    assert sets[1] & sets[2]  # shared prefix ⇒ shared fingerprints
    assert not (sets[1] & sets[3])


def test_text_profile_matches_standalone_operators(spark, docs):
    """The fused one-projection profile is column-for-column identical to
    token_count ⋈ quality_score ⋈ language_id."""
    real = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    for d in (docs, real):
        fused = {r.asDict()["doc_id"]: r.asDict() for r in textstats.text_profile(d).collect()}
        tc = {r.doc_id: r.asDict() for r in textstats.token_count(d).collect()}
        qs = {r.doc_id: r.asDict() for r in textstats.quality_score(d).collect()}
        li = {r.doc_id: r.asDict() for r in textstats.language_id(d).collect()}
        assert set(fused) == set(tc)
        for k, row in fused.items():
            expected = {**tc[k], **qs[k], **li[k]}
            assert row == expected, k


def test_runs_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    assert textstats.language_id(docs).count() == 100
    assert textstats.quality_score(docs).count() == 100
    assert textstats.fingerprint_summary(docs, n=8, window=4).count() == 100


def test_budget_pack_matches_sequential_greedy(spark):
    """The bucketed distributed prefix sum == the naive sequential greedy:
    sort all docs by (quality desc, id), accumulate, keep while ≤ budget."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(300)
    scored = sorted(
        textstats.quality_score(docs).select(
            "doc_id", "n_tokens", "quality_score"
        ).collect(),
        key=lambda r: (-r.quality_score, r.doc_id),
    )
    budget = 5_000
    run, expected = 0, {}
    for r in scored:
        run += r.n_tokens
        if run > budget:
            break
        expected[r.doc_id] = run
    got = {
        r.doc_id: r.cum_tokens
        for r in textstats.budget_pack(docs, budget).collect()
    }
    assert got == expected and got  # nonempty and exact, incl. cum values


def test_budget_pack_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, "the and is of to in it for on this " * 30),  # high stop-ratio
            (2, ";;;;;;;;;;"),  # junk
            (3, "plain english words here with the usual amount of text"),
        ],
        "doc_id long, text string",
    )
    # budget below the best doc's token count -> empty selection
    assert textstats.budget_pack(docs, 1).count() == 0
    # budget exactly at the first cum -> inclusive keep
    first = textstats.budget_pack(docs, 10**9).orderBy("cum_tokens").first()
    assert textstats.budget_pack(docs, first.cum_tokens).count() == 1
    # huge budget keeps everything
    assert textstats.budget_pack(docs, 10**9).count() == 3


def test_pii_scan_counts_and_canary(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or x@y.io, see https://e.eu/p?q=1"),
            (2, "call +49 (30) 1234-5678 now; ref 20240131 and 987654"),
            (3, "clean text with no findings at all"),
            (4, "leaked CANARY-EVAL-DO-NOT-TRAIN marker inside"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_emails, r.n_urls, r.n_phones, r.n_digit_runs, r.has_canary)
        for r in textstats.pii_scan(docs, canaries=["CANARY-EVAL-DO-NOT-TRAIN"]).collect()
    }
    assert got[1] == (2, 1, 0, 0, False)
    assert got[2][0] == 0 and got[2][2] >= 1 and got[2][3] >= 1 and not got[2][4]
    assert got[3] == (0, 0, 0, 0, False)
    assert got[4][4] is True


def test_pii_scan_matches_duckdb(spark):
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "a@b.co and c@d.org via http://u.eu/x"),
            (2, "+1 212 555 0199 order 123456789"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in textstats.pii_scan(docs).collect()}
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {tuple(r) for r in con.execute(textstats.pii_scan_sql()).fetchall()}
    assert got == want


def test_pii_scan_is_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = textstats.pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_topk_order_and_values(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana apple cherry banana apple")],
        "doc_id long, text string",
    )
    got = [(r.tok, r.n) for r in textstats.vocab_topk(docs, k=2).collect()]
    assert got == [("apple", 4), ("banana", 3)]


def test_winnow_pairs_finds_copies_not_strangers(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "A start. " + shared + " End one."),
            (2, "B opens. " + shared + " Closing two."),
            (3, "totally different content with zero overlap whatsoever xyz"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b) for r in textstats.winnow_pairs(docs, min_shared=2).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_df_cap_drops_boilerplate(spark):
    boiler = "standard legal footer shared by every page in this corpus"
    docs = spark.createDataFrame(
        [(i, f"unique body {i} :: " + boiler) for i in range(10)],
        "doc_id long, text string",
    )
    # cap 5 < df 10: the boilerplate fingerprints drop, and the unique
    # bodies share nothing — no pairs survive
    assert textstats.winnow_pairs(docs, min_shared=2, df_cap=5).count() == 0
    # without the cap the boilerplate links every pair
    assert textstats.winnow_pairs(docs, min_shared=2).count() == 45


def test_sequence_pack_is_gapless_and_stable(spark):
    docs = spark.createDataFrame(
        [(i, ("word " * (5 + i % 17)).strip()) for i in range(300)],
        "doc_id long, text string",
    )
    got = textstats.sequence_pack(docs, window_tokens=64).collect()
    rows = sorted(got, key=lambda r: r.start_offset)
    # gapless end-to-end layout: each doc starts where the previous ended
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        assert r.window_id == pos // 64
        assert r.offset_in_window == pos % 64
        pos += r.n_tokens
    assert pos == sum(r.n_tokens for r in rows)
    # deterministic under repartitioning
    again = textstats.sequence_pack(docs.repartition(7), window_tokens=64).collect()
    assert {(r.doc_id, r.start_offset) for r in got} == {
        (r.doc_id, r.start_offset) for r in again
    }
    # the layout order is the hash shuffle, not doc_id order
    by_id = [r.start_offset for r in sorted(got, key=lambda r: r.doc_id)]
    assert by_id != sorted(by_id)


def test_pii_redact_values_and_duckdb_parity(spark):
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "write a@b.co or visit https://u:p@h.example/x now"),
            (2, "call +1 (212) 555-0199 today"),
            (3, "nothing sensitive"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text_redacted for r in textstats.pii_redact(docs).collect()}
    assert got[1] == "write [EMAIL] or visit [URL] now"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "nothing sensitive"
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {r[0]: r[1] for r in con.execute(textstats.pii_redact_sql()).fetchall()}
    assert got == want


def test_repetition_profile(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, "buy now" twice -> dup_line_frac = 2/4 = 0.5 (flag >0.3)
            (1, "buy now\nunique line one\nbuy now\nunique line two"),
            # clean prose: no repeated lines, no dominant bigram
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            # SEO stuffing: "cheap flights" bigram dominates
            (3, "cheap flights cheap flights cheap flights to paris"),
            # single line, single token: no bigrams, nothing flagged
            (4, "hello"),
            # blank/whitespace lines are dropped before counting
            (5, "a line\n\n   \na line"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.repetition_profile(docs).collect()}
    assert got[1].n_lines == 4 and got[1].dup_line_frac == 0.5 and got[1].flagged
    assert not got[2].flagged and got[2].dup_line_frac == 0.0
    # doc 3: tokens = [cheap, flights]*3 + [to, paris]; bigram "cheap flights"
    # occurs 3 of 7 bigrams -> 0.428571 > 0.18
    assert got[3].n_bigrams == 7
    assert got[3].top_bigram_frac == pytest.approx(3 / 7, abs=1e-6)
    assert got[3].flagged
    assert got[4].n_lines == 1 and got[4].n_bigrams == 0 and not got[4].flagged
    # doc 5: blank lines dropped -> 2 lines, both "a line" -> dup frac 1.0
    assert got[5].n_lines == 2 and got[5].dup_line_frac == 1.0 and got[5].flagged


def test_c4_quality_profile(spark):
    docs = spark.createDataFrame(
        [
            # 3 sentences across 2 kept lines; third line dropped (no
            # terminal punct), fourth dropped (< 5 words)
            (
                1,
                "This is a full sentence with enough words.\n"
                "Another good line follows here! And one more thing?\n"
                "a trailing header without punctuation\n"
                "Too short.",
            ),
            # lorem ipsum rejects the page even with enough sentences
            (
                2,
                "One proper sentence sits right here.\n"
                "Lorem ipsum dolor sit amet consectetur.\n"
                "A third full sentence closes the page.",
            ),
            # curly brace (code leakage) rejects the page
            (3, "A fine sentence with plenty of words. { code }"),
            # javascript line is dropped; page then has < 3 sentences
            (
                4,
                "Please enable javascript to view this page.\n"
                "Only this one real sentence remains standing.",
            ),
            (5, ""),  # degenerate: empty page
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.c4_quality_profile(docs).collect()}
    assert got[1].n_lines == 4 and got[1].n_kept_lines == 2
    assert got[1].n_sentences == 3 and got[1].keep
    assert got[2].has_lorem and not got[2].keep and got[2].n_sentences == 3
    assert got[3].has_brace and not got[3].keep
    # doc 4: the javascript line is excluded from kept lines
    assert got[4].n_kept_lines == 1 and got[4].n_sentences == 1
    assert not got[4].keep
    assert got[5].n_lines == 0 and got[5].kept_chars == 0 and not got[5].keep


def test_quality_classifier(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, ""),
            (4, "zzz"),
        ],
        "doc_id long, text string",
    )
    out = textstats.quality_classifier(docs)
    got = {r.doc_id: r for r in out.collect()}
    # deterministic: identical text scores identically
    assert got[1].score == got[2].score and got[1].keep == got[2].keep
    assert got[1].n_tokens == 9
    # empty doc: zero tokens, zero score, not kept at threshold 0
    assert got[3].n_tokens == 0 and got[3].score == 0.0 and not got[3].keep
    # score is mean-pooled: bounded by the weight range
    assert all(-0.5 <= r.score <= 0.5 for r in got.values())
    # keep is exactly score > threshold
    assert all(r.keep == (r.score > 0.0) for r in got.values())
    # plan shape: the weight dimension broadcasts; the only joins/shuffles
    # are the two doc-keyed aggregations — no reattach join of the corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # audit the AQE final plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_text_curation_full_discriminates(spark):
    # the composed verdict must not be degenerate: on the synthetic corpus
    # both keep and reject must occur, and keep_final must equal the AND of
    # its published stage columns (catches a stage silently dropping out)
    import __spark_entry__ as entry

    rows = entry.queries()["text_curation_full"](spark, SF_DIR).collect()
    keeps = [r.keep_final for r in rows]
    assert any(keeps) and not all(keeps)
    for r in rows:
        assert r.keep_final == (
            (r.quality_score >= 0.5)
            and r.lang_pred != "und"
            and not r.rep_flagged
            and r.clf_keep
            and not r.is_dup_loser
        )
