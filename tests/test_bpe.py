"""BPE merge training (operators/bpe.py): the fixed-width-id replace
rewrite against a pure-Python reference BPE (greedy left-to-right,
non-overlapping — the Sennrich et al. 2016 semantics), adjacency edge
cases the string encoding must get right, and cross-engine parity with
the generated DuckDB mirror."""

from __future__ import annotations

import duckdb

from europarl_crawler_spark.operators import bpe


def _ref_bpe(word_freqs: dict[str, int], rounds: int):
    """Reference trainer on symbol-id tuples — same greedy left-to-right
    merge, and the same deterministic tie-break the engine pins: count
    DESC, then the fixed-width symbol IDS ascending (so chars order by
    codepoint and sort before merged symbols).  Returns human-readable
    (round, left, right, n) rows via the id->string table."""
    seqs = {
        tuple(f"c{ord(ch):03d}" for ch in w): f for w, f in word_freqs.items()
    }
    tab = {}

    def dec(sym):
        return tab[sym] if sym in tab else chr(int(sym[1:]))

    out = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # deterministic argmax: n DESC then id pair ASC
        (l, rr), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = f"m{r:03d}"
        tab[merged] = dec(l) + dec(rr)
        out.append((r, dec(l), dec(rr), n))
        new = {}
        for syms, f in seqs.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + f
        seqs = new
    return out


def _train_on_words(spark, words: list[str], rounds: int):
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    rows = bpe.bpe_train(docs, rounds=rounds).collect()
    return bpe.decode_merges([tuple(r) for r in rows])


def test_matches_reference_on_adjacent_runs(spark):
    # "aaaa" must merge to "aa aa" in round 1 (the non-overlapping
    # left-to-right scan), then "aaaa" in round 2 — the case a shared-
    # boundary string encoding gets wrong.
    got = _train_on_words(spark, ["aaaa"] * 3 + ["ab"], rounds=2)
    ref = _ref_bpe({tuple("aaaa"): 3, tuple("ab"): 1}, 2)
    assert [(r, l, rr, n) for r, l, rr, _, n in got] == ref
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_odd_run_leaves_singleton(spark):
    # "aaa" -> "aa a": pair count after round 1 is (aa, a), not (a, aa)
    got = _train_on_words(spark, ["aaa"] * 2, rounds=2)
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "a")


def test_no_cross_symbol_false_merge(spark):
    # pair ('a','b'): the symbol 'xa' must NOT merge its trailing 'a' with
    # the following 'b' — the fixed-width id encoding's whole job.
    words = ["ab"] * 5 + ["xab"] * 3
    got = _train_on_words(spark, words, rounds=2)
    ref = _ref_bpe({tuple("ab"): 5, tuple("xab"): 3}, 2)
    assert [(r, l, rr, n) for r, l, rr, _, n in got] == ref
    # round 1 merges (a,b) with weight 8 (both word shapes contribute)
    assert got[0][1:3] == ("a", "b") and got[0][4] == 8


def test_matches_reference_on_mixed_corpus(spark):
    words = (
        ["hash"] * 9 + ["join"] * 7 + ["hashing"] * 4 + ["joins"] * 3
        + ["a"] * 10  # 1-char words contribute no pairs
    )
    got = _train_on_words(spark, words, rounds=6)
    freqs: dict[tuple, int] = {}
    for w in words:
        freqs[tuple(w)] = freqs.get(tuple(w), 0) + 1
    ref = _ref_bpe(freqs, 6)
    assert [(r, l, rr, n) for r, l, rr, _, n in got] == ref


def test_duckdb_mirror_parity(spark):
    docs_rows = [
        (i, t)
        for i, t in enumerate(
            ["the merge order", "the sort order", "merge the sort",
             "order by merge", "sort sort sort the"] * 4
        )
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in bpe.bpe_train(docs, rounds=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
                % ", ".join("(%d, '%s')" % r for r in docs_rows))
    ora = sorted(tuple(r) for r in con.execute(bpe.bpe_train_sql(rounds=5)).fetchall())
    assert got == ora


def test_apostrophe_tokens_survive_encoding(spark):
    got = _train_on_words(spark, ["don't"] * 4, rounds=1)
    assert got[0][1:3] in {("d", "o"), ("o", "n"), ("n", "'"), ("'", "t")}
    # codepoint 39 encodes as c039 and decodes back
    assert any("'" in (l + rr) for _, l, rr, _, _ in got) or got[0][4] == 4


def test_encode_counts_match_manual_replay(spark):
    words = ["hash"] * 6 + ["has"] * 2 + ["h"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = [tuple(r) for r in bpe.bpe_train(docs, rounds=3).collect()]
    dec = bpe.decode_merges(merges)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_encode_counts(docs, rounds=3).collect()
    }
    # replay each word through the learned merges in python
    def encode(word):
        syms = list(word)
        for _, l, rr, _m, _n in dec:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    res.append(l + rr)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    for i, w in enumerate(words):
        assert got[i] == (1, encode(w)), (i, w)


def test_encode_duckdb_mirror_parity(spark):
    rows = [(i, t) for i, t in enumerate(
        ["sort merge join", "hash join hash", "merge sort", "a b ab abc"] * 3
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in bpe.bpe_encode_counts(docs, rounds=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES %s) t(doc_id, text)"
                % ", ".join("(%d, '%s')" % r for r in rows))
    ora = sorted(tuple(r) for r in con.execute(bpe.bpe_encode_sql(rounds=4)).fetchall())
    assert got == ora
