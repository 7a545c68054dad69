"""Distributed byte-pair-encoding merge training (Sennrich et al. 2016) —
the tokenizer-construction step of every LLM data pipeline, run over the
corpus the engine just curated.

Word boundaries: merges run WITHIN words only (the word-frequency table
representation makes cross-word merges impossible by construction), and no
end-of-word marker is appended — the SentencePiece-style convention.  The
Sennrich '</w>' variant drops in trivially: append a reserved fixed-width
id (e.g. 'w000') in ``initial_seqs`` and its mirror; nothing else changes.

Algorithm (classic BPE on the word-frequency table):
  1. tokenize the corpus and aggregate to (word, corpus_frequency) — the
     corpus is touched exactly once; every later round works on the
     vocabulary-sized table;
  2. represent each word as a sequence of symbols (initially characters);
  3. per round: count adjacent symbol pairs weighted by word frequency,
     pick the most frequent pair (ties broken by the fixed-width symbol
     IDS ascending — chars by codepoint, then merged symbols by creation
     round — so the result is deterministic and engine-neutral), merge
     every non-overlapping occurrence left-to-right, record the merge.

Cross-engine-exact representation — the whole point of this module: a
word's symbol sequence is stored as FIXED-WIDTH symbol ids joined by a
separator:

    initial char c  ->  'c' + zero-padded 3-digit codepoint   ('c104')
    round-r merge   ->  'm' + zero-padded 3-digit round       ('m001')

so "hash" is 'c104\\x1fc097\\x1fc115\\x1fc104'. Merging pair (l, r) is then
ONE literal string replace of 'l\\x1fr' with the new id: because every id
is exactly 4 chars and the separator never appears inside an id, a match
can only start at a symbol boundary (no id is a proper suffix of another's
tail), and because the separator BETWEEN adjacent occurrences is not part
of the pattern, `replace`'s standard non-overlapping left-to-right scan
merges an adjacent run exactly the way reference BPE does ("a a a a" ->
"aa aa", "a a a" -> "aa a").  Spark's `F.replace` and DuckDB's `replace`
share those semantics, so the DuckDB oracle replays every round —
pair counts, argmax, tie-break, rewrite — bit-for-bit.

Plan shape at 100 TB: the corpus-sized work is one explode -> groupBy
(map-side combinable) producing the word table; each merge round is a
groupBy count over the word table plus a `LIMIT 1` argmax — merges are
inherently sequential (round r+1's counts depend on round r's rewrite), so
the per-round driver round-trip carries exactly ONE 3-field row, and the
word table (vocabulary-sized, not corpus-sized) stays cached on the
executors.  This is the same structure production distributed BPE trainers
use (e.g. the Spark tokenizer-training recipes for GPT-style corpora).

Reference analog: the reference has no tokenizer trainer (its extraction
stops at raw text, europarl/documents/extractors.py); this is part of the
LLM-training-data surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textstats import tokens_expr

SEP = "\x1f"  # unit separator between fixed-width symbol ids


def _char_id(ch):
    """'c' + 3-digit codepoint of a 1-char column — fixed width 4."""
    return F.concat(F.lit("c"), F.lpad(F.ascii(ch).cast("string"), 3, "0"))


def round_id(r: int) -> str:
    """Symbol id minted by merge round ``r`` (1-based) — fixed width 4."""
    return f"m{r:03d}"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the only corpus-sized pass."""
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_seqs(words: DataFrame, keep_word: bool = False) -> DataFrame:
    """Encode each word as its fixed-width char-id sequence."""
    seq = F.concat_ws(
        SEP, F.transform(F.split(F.col("word"), ""), _char_id)
    )
    cols = ([F.col("word")] if keep_word else []) + [seq.alias("seq"), F.col("freq")]
    return words.select(*cols)


def pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair counts over symbol sequences, weighted by word freq."""
    ids = F.split(F.col("seq"), SEP)
    pairs = F.arrays_zip(
        F.slice(ids, 1, F.size(ids) - 1).alias("l"),
        F.slice(ids, 2, F.size(ids) - 1).alias("r"),
    )
    return (
        seqs.select(F.explode(pairs).alias("p"), F.col("freq"))
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq")
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("n"))
    )


def _train_merges(seqs: DataFrame, rounds: int) -> list[tuple]:
    """The sequential merge loop: one single-row collect per round."""
    out: list[tuple] = []
    cur = seqs
    for r in range(1, rounds + 1):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol already
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merged = round_id(r)
        out.append((r, left, right, merged, n))
        cur = cur.select(
            F.replace(
                F.col("seq"), F.lit(left + SEP + right), F.lit(merged)
            ).alias("seq"),
            F.col("freq"),
        )
    return out


def bpe_train(
    docs: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Train ``rounds`` BPE merges over the corpus; returns one row per
    round: (round, left_sym, right_sym, merged_sym, n) with the symbol ids
    described in the module doc and ``n`` the pair's weighted count at the
    moment it was chosen.  The per-round ``collect()`` carries exactly one
    row (see module doc — merges are sequential by definition)."""
    spark = docs.sparkSession
    seqs = initial_seqs(word_freqs(docs, text_col)).cache()
    try:
        out = _train_merges(seqs, rounds)
    finally:
        seqs.unpersist()
    schema = T.StructType(
        [
            T.StructField("round", T.IntegerType()),
            T.StructField("left_sym", T.StringType()),
            T.StructField("right_sym", T.StringType()),
            T.StructField("merged_sym", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def decode_merges(merges: list[tuple]) -> list[tuple]:
    """Driver-side decode of merge rows to human-readable token strings —
    (round, left_tok, right_tok, merged_tok, n).  Char ids decode directly;
    merged ids resolve through the rounds seen so far (pytest surface, not
    part of the oracle-checked lane)."""
    tab: dict[str, str] = {}

    def dec(sym: str) -> str:
        if sym in tab:
            return tab[sym]
        assert sym.startswith("c"), sym
        return chr(int(sym[1:]))

    out = []
    for r, l, rr, m, n in merges:
        lt, rt = dec(l), dec(rr)
        tab[m] = lt + rt
        out.append((r, lt, rt, lt + rt, n))
    return out


def bpe_encode_counts(
    docs: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with the BPE model it just trained: apply the
    ``rounds`` learned merges to every vocabulary word, then roll the
    per-word subword counts back up per document — the "how many training
    tokens is this corpus" question every data pipeline answers before a
    run.  Output: (doc_id, n_words, n_bpe_tokens).

    Plan: training as in ``bpe_train`` (vocabulary-sized rounds), then ONE
    projection applying the R literal replaces over the word table, and a
    word-keyed join from the exploded corpus back to per-word subword
    counts (vocabulary-sized build side) + doc-keyed sum."""
    spark = docs.sparkSession
    words = word_freqs(docs, text_col)
    seqs = initial_seqs(words, keep_word=True).cache()
    try:
        merges = _train_merges(seqs.select("seq", "freq"), rounds)
        enc = F.col("seq")
        for _, left, right, merged, _ in merges:
            enc = F.replace(enc, F.lit(left + SEP + right), F.lit(merged))
        word_syms = seqs.select(
            "word", F.size(F.split(enc, SEP)).cast("long").alias("n_syms")
        )
        tokd = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_expr(text_col)).alias("word"),
        )
        return (
            tokd.join(word_syms, "word")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_syms").alias("n_bpe_tokens"),
            )
        )
    finally:
        seqs.unpersist()


# ---- DuckDB oracle mirror ----

def _round_ctes(
    rounds: int, table: str, text_expr: str, keep_word: bool
) -> list[str]:
    """The shared CTE chain: word freqs, fixed-width encoding, and one
    (b{r}: chosen merge, s{r}: rewritten sequences) pair per round —
    same tokenizer, same weighted pair counts, same (n DESC, l, r)
    argmax, same left-to-right literal replace as the Spark loop."""
    sep = "chr(31)"
    tok = (
        f"SELECT unnest(regexp_split_to_array(lower({text_expr}), "
        f"'[^a-zA-Z0-9'']+')) AS word FROM {table}"
    )
    enc = (
        "array_to_string([('c' || lpad(CAST(unicode(x) AS VARCHAR), 3, '0')) "
        f"FOR x IN string_split(word, '')], {sep})"
    )
    wcol = "word, " if keep_word else ""
    parts = [
        f"w AS (SELECT word, count(*) AS freq FROM ({tok}) "
        "WHERE word != '' GROUP BY word)",
        f"s0 AS (SELECT {wcol}{enc} AS seq, freq FROM w)",
    ]

    def pair_cte(src: str) -> str:
        return (
            "SELECT z[1] AS l, z[2] AS r, SUM(freq) AS n FROM ("
            f"SELECT unnest(list_zip(ids, ids[2:])) AS z, freq FROM ("
            f"SELECT string_split(seq, {sep}) AS ids, freq FROM {src})) "
            "WHERE z[2] IS NOT NULL GROUP BY 1, 2"
        )

    for r in range(1, rounds + 1):
        parts.append(
            f"b{r} AS (SELECT l, r, n FROM ({pair_cte(f's{r-1}')}) "
            "ORDER BY n DESC, l ASC, r ASC LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT {wcol}replace(seq, "
            f"(SELECT l || {sep} || r FROM b{r}), '{round_id(r)}') AS seq, "
            f"freq FROM s{r-1})"
        )
    return parts


def bpe_train_sql(
    rounds: int = 8, table: str = "documents", text_expr: str = "text"
) -> str:
    """Generated SQL replaying every training round (see ``_round_ctes``)."""
    parts = _round_ctes(rounds, table, text_expr, keep_word=False)
    selects = [
        f"SELECT {r} AS round, l AS left_sym, r AS right_sym, "
        f"'{round_id(r)}' AS merged_sym, CAST(n AS BIGINT) AS n FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def bpe_encode_sql(
    rounds: int = 8,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB mirror of ``bpe_encode_counts``: the same training CTE chain
    (word column carried through), then per-word subword counts from the
    final rewritten sequences rolled up per document."""
    sep = "chr(31)"
    parts = _round_ctes(rounds, table, text_expr, keep_word=True)
    tok = (
        f"SELECT {id_expr} AS doc_id, unnest(regexp_split_to_array("
        f"lower({text_expr}), '[^a-zA-Z0-9'']+')) AS word FROM {table}"
    )
    parts.append(
        f"enc AS (SELECT word, CAST(len(string_split(seq, {sep})) AS BIGINT) "
        f"AS n_syms FROM s{rounds})"
    )
    parts.append(
        f"tokd AS (SELECT doc_id, word FROM ({tok}) WHERE word != '')"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens "
        "FROM tokd JOIN enc USING (word) GROUP BY doc_id"
    )
