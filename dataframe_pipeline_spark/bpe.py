"""Distributed BPE (byte-pair encoding) subword tokenizer — trainer and
tokenizer, Spark-first.

Algorithm (Sennrich et al. 2016, the classic corpus BPE; public):
start from characters (plus an end-of-word marker), repeatedly find the
most frequent adjacent symbol pair and merge it, ``n_merges`` times.
Tokenization applies the learned merges in rank order (equivalent to
lowest-rank-first priority merging: a merge can only create pairs of
LATER rank than itself, so sequential-by-rank and priority-queue
application produce identical output).

Scale design — the 100 TB story:

* The ONLY corpus-scale pass is word-frequency extraction: one
  explode + one keyed shuffle.  Everything after runs on the bounded
  word-frequency table (|vocab| rows, not |corpus|) — exactly how
  production BPE trainers work, but here the vocab table itself is a
  DataFrame, so a billion-distinct-word corpus still fits the model.
* Each merge round is one tiny aggregate on the vocab table (pair
  counts via two array slices zipped — no posexplode of the corpus)
  plus a driver-side argmax of ONE row.  The merge is applied with a
  single ``aggregate`` HOF fold per word — left-greedy non-overlapping,
  pure codegen, no Python.  ``localCheckpoint`` every few rounds cuts
  the k-deep lineage.
* Tokenization never touches duplicate words twice: the input is
  reduced to distinct words (one shuffle), merges apply to the DISTINCT
  vocabulary, and results join back — token counts over a 100 TB corpus
  cost one word shuffle plus a vocab-sized merge chain.
* ``BpeTokenizer.transform`` offers two tiers: ``native`` chains the
  per-rule HOF folds (all-JVM codegen; expression depth grows with
  n_merges, capped), and ``pandas`` runs the standard rank-dict
  priority merger in an Arrow-batched UDF (the genuinely-iterative
  inner loop is the textbook case for the pandas tier).  Both tiers are
  equivalence-tested against each other and a pure-Python reference.

Determinism: pair argmax tie-breaks on (count DESC, left ASC, right
ASC); the oracle replays an independent pure-Python implementation with
the same tie-break, so the distributed trainer must reproduce the
reference merge table exactly.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"


# ---------------------------------------------------------------------------
# shared expression builders
# ---------------------------------------------------------------------------

def _word_symbols(w):
    """Characters of a word plus the end-of-word marker symbol."""
    return F.array_append(F.split(w, ""), F.lit(EOW))


def _merge_fold(col, left: str, right: str):
    """One left-greedy non-overlapping merge pass (left,right)->left+right
    over an array<string> column — a single ``aggregate`` HOF, no Python.

    The accumulator carries (out, pend): ``pend`` is the previous symbol
    not yet emitted; when (pend, s) matches the rule the merged symbol
    is emitted and ``pend`` clears, so a merged token never re-merges
    with the next symbol in the same pass (classic BPE single-rule
    application)."""
    merged = left + right
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit(None).cast("string").alias("pend"))

    def step(acc, s):
        return (
            F.when(acc.pend.isNull(),
                   F.struct(acc.out.alias("out"), s.alias("pend")))
            .when((acc.pend == F.lit(left)) & (s == F.lit(right)),
                  F.struct(F.array_append(acc.out, F.lit(merged)).alias("out"),
                           F.lit(None).cast("string").alias("pend")))
            .otherwise(F.struct(F.array_append(acc.out, acc.pend).alias("out"),
                                s.alias("pend"))))

    def finish(acc):
        return F.when(acc.pend.isNull(), acc.out) \
                .otherwise(F.array_append(acc.out, acc.pend))

    return F.aggregate(col, init, step, finish)


def _apply_merges(col, merges) -> object:
    """Chain the per-rank merge folds in learned order (the reference
    application algorithm)."""
    for left, right in merges:
        col = _merge_fold(col, left, right)
    return col


def _pair_counts(words: DataFrame, sym: str = "symbols",
                 freq: str = "freq") -> DataFrame:
    """Adjacent-pair frequencies over the vocab table: zip each symbol
    array with its own tail (two slices — no index explode of the
    corpus) and weight by word frequency."""
    s = F.col(sym)
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("l"),
        F.slice(s, 2, F.size(s) - 1).alias("r"))
    return (words.filter(F.size(s) >= 2)
            .select(F.col(freq), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum(freq).alias("pair_freq")))


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class BpeTrainer:
    """Learn ``n_merges`` BPE merge rules from a text column.

    After ``fit``: ``merges_`` is the ordered rule list
    ``[(left, right, pair_freq), ...]`` and ``words_`` the final
    symbolized vocab table (unpersisted on refit).
    """

    #: vocab tables at or under this many DISTINCT words take the
    #: driver fast path: one collect, merge rounds in Python.  A BPE
    #: merge round over the vocab TABLE costs a full driver round-trip
    #: (aggregate job + deep-HOF plan re-analysis) — n_merges of them
    #: dominated `text_bpe_tokens` at sf1 (94s for 12 rounds over a
    #: 31-word vocab).  The collected state is symbols+freq per distinct
    #: word — fitted-parameter-sized at this gate, the same collect
    #: class as the encoder dictionaries.  Real corpora with
    #: million-word vocabularies keep the distributed loop.
    FAST_VOCAB_ROWS = 8192

    def __init__(self, n_merges: int = 32, lowercase: bool = False,
                 min_pair_freq: int = 2, checkpoint_every: int = 4):
        self.n_merges = n_merges
        self.lowercase = lowercase
        self.min_pair_freq = min_pair_freq
        self.checkpoint_every = checkpoint_every
        self.merges_: list[tuple[str, str, int]] | None = None

    def _words(self, df: DataFrame, col: str) -> DataFrame:
        text = F.lower(F.col(col)) if self.lowercase else F.col(col)
        return (df.select(F.explode(F.split(text, r"\s+")).alias("w"))
                .filter(F.col("w") != "")
                .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
                .select(_word_symbols(F.col("w")).alias("symbols"), "freq"))

    def _fit_rows(self, rows) -> list[tuple[str, str, int]]:
        """Driver-side merge rounds over collected (symbols, freq)
        pairs — the identical algorithm and (count DESC, left ASC,
        right ASC) tie-break as the distributed loop and
        :func:`reference_bpe` (differential-tested)."""
        from collections import Counter

        vocab = [list(s) for s, _ in rows]
        freqs = [f for _, f in rows]
        merges: list[tuple[str, str, int]] = []
        for _ in range(self.n_merges):
            pc: Counter = Counter()
            for s, f in zip(vocab, freqs):
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += f
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < self.min_pair_freq:
                break
            merges.append((l, r, int(c)))
            for k, s in enumerate(vocab):
                out, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                vocab[k] = out
        return merges

    def fit(self, df: DataFrame, col: str = "text") -> "BpeTrainer":
        # checkpoint FIRST so the size probe and whichever path follows
        # share ONE corpus aggregation: probing the lazy frame and then
        # checkpointing it would re-run the word shuffle from scratch
        # on exactly the corpora where the distributed loop is expensive
        words0 = self._words(df, col).localCheckpoint(eager=True)
        # size-gated fast path: limit(N+1) early-exits on large vocabs,
        # so the probe costs one cheap block read either way
        head = words0.limit(self.FAST_VOCAB_ROWS + 1).collect()
        if len(head) <= self.FAST_VOCAB_ROWS:
            self.merges_ = self._fit_rows(
                [(list(r["symbols"]), int(r["freq"])) for r in head])
            # lazy symbolized-vocab frame for any words_ consumer —
            # built from the fitted rules over the checkpointed vocab
            words = words0
            for l, r, _c in self.merges_:
                words = words.withColumn(
                    "symbols", _merge_fold(F.col("symbols"), l, r))
            self.words_ = words
            return self
        words = words0
        self.merges_ = []
        for i in range(self.n_merges):
            top = (_pair_counts(words)
                   .orderBy(F.desc("pair_freq"), F.asc("left"),
                            F.asc("right"))
                   .limit(1).collect())
            if not top or top[0]["pair_freq"] < self.min_pair_freq:
                break
            left, right, cnt = (top[0]["left"], top[0]["right"],
                                int(top[0]["pair_freq"]))
            self.merges_.append((left, right, cnt))
            words = words.withColumn(
                "symbols", _merge_fold(F.col("symbols"), left, right))
            if (i + 1) % self.checkpoint_every == 0:
                words = words.localCheckpoint(eager=True)
        self.words_ = words
        return self

    def merges_df(self, spark: SparkSession) -> DataFrame:
        # lhs/rhs, not left/right: LEFT/RIGHT are reserved words in most
        # SQL dialects and the merge table round-trips through oracles.
        assert self.merges_ is not None, "call fit first"
        rows = [(r, l, rt, l + rt, c)
                for r, (l, rt, c) in enumerate(self.merges_)]
        return spark.createDataFrame(
            rows, "rank int, lhs string, rhs string, merged string, "
                  "pair_freq long")


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

class BpeTokenizer:
    """Apply fitted merges to a text column.

    ``tier='native'``: chained HOF folds, all-JVM (good to a few dozen
    merges — expression depth grows linearly).  ``tier='pandas'``:
    Arrow-batched UDF running the rank-dict priority merger (any
    n_merges).  Both produce identical output (tested)."""

    NATIVE_MAX_MERGES = 64

    def __init__(self, merges, lowercase: bool = False,
                 tier: str = "native"):
        if tier not in ("native", "pandas"):
            raise ValueError(f"tier must be native/pandas, not {tier!r}")
        self.merges = [(m[0], m[1]) for m in merges]
        self.lowercase = lowercase
        if tier == "native" and len(self.merges) > self.NATIVE_MAX_MERGES:
            tier = "pandas"
        self.tier = tier

    # -- distinct-word path (the scale path) --------------------------
    def word_tokens(self, words: DataFrame, col: str = "w") -> DataFrame:
        """tokens array per DISTINCT word — merge chain runs once per
        vocabulary entry, never once per corpus occurrence."""
        syms = _word_symbols(F.col(col))
        if self.tier == "native":
            return words.withColumn("tokens", _apply_merges(syms, self.merges))
        return words.withColumn("tokens", self._pandas_udf()(F.col(col)))

    def transform(self, df: DataFrame, col: str = "text",
                  out: str = "tokens") -> DataFrame:
        """Per-row tokenization: words in order, each word's subword
        tokens concatenated.  Joins each row's words against the
        distinct-word token table would reorder; instead the merge chain
        (native) or UDF (pandas) runs per row — use
        :meth:`token_counts` for corpus statistics at scale."""
        text = F.lower(F.col(col)) if self.lowercase else F.col(col)
        wordarr = F.filter(F.split(text, r"\s+"), lambda w: w != "")
        if self.tier == "native":
            tok = F.flatten(F.transform(
                wordarr,
                lambda w: _apply_merges(_word_symbols(w), self.merges)))
            return df.withColumn(out, tok)
        udf = self._pandas_udf()
        joined = F.array_join(wordarr, " ")
        return df.withColumn(out, udf(joined))

    def token_counts(self, df: DataFrame, col: str = "text") -> DataFrame:
        """Corpus token frequencies: ONE word shuffle, merges applied to
        distinct words only, counts re-weighted by word frequency.

        The token table is MATERIALIZED (localCheckpoint) before the
        explode: fusing the n_merges-deep fold chain into the
        ``Generate`` disables whole-stage codegen for the fused stages,
        and the corpus-scale word scan then runs interpreted — measured
        71.6s vs 2.3s at sf1, growing linearly with corpus size (the
        same failure class as the MinHash band explode, dedup.py
        ``_bands``).  The materialized frame is vocab-sized (one row
        per DISTINCT word — bounded state, the thing a production
        tokenizer persists anyway), so the checkpoint is cheap at any
        corpus scale."""
        text = F.lower(F.col(col)) if self.lowercase else F.col(col)
        words = (df.select(F.explode(F.split(text, r"\s+")).alias("w"))
                 .filter(F.col("w") != "")
                 .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
        toks = self.word_tokens(words, "w").localCheckpoint(eager=True)
        return (toks.select("freq", F.explode("tokens").alias("token"))
                .groupBy("token").agg(F.sum("freq").alias("n")))

    def _pandas_udf(self):
        """Rank-dict priority merger (GPT-2-style), Arrow-batched.
        Takes whitespace-joined text, returns the token array."""
        from pyspark.sql.functions import pandas_udf

        ranks = {pair: i for i, pair in enumerate(self.merges)}
        eow = EOW

        def encode_word(w: str) -> list[str]:
            syms = list(w) + [eow]
            while len(syms) >= 2:
                best, best_rank, best_i = None, None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank, best_i = (syms[i], syms[i + 1]), r, i
                if best is None:
                    break
                # merge ALL non-overlapping occurrences left-to-right
                # (identical to one sequential pass of that rule)
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1
                            and (syms[i], syms[i + 1]) == best):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        @pandas_udf("array<string>")
        def tokenize(s: pd.Series) -> pd.Series:
            return s.map(lambda t: [tok for w in t.split()
                                    for tok in encode_word(w)]
                         if isinstance(t, str) else None)

        return tokenize


# ---------------------------------------------------------------------------
# pure-Python reference (tests + oracle generation — NOT a Spark path)
# ---------------------------------------------------------------------------

def reference_bpe(texts, n_merges: int, lowercase: bool = False,
                  min_pair_freq: int = 2):
    """Independent reference implementation with the same tie-break;
    returns (merges, word_freqs).  Used by the generated oracle and the
    differential tests — kept intentionally simple and separate from
    the Spark code path."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        if t is None:
            continue
        if lowercase:
            t = t.lower()
        for w in t.split():
            wf[w] += 1
    vocab = {w: list(w) + [EOW] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        # (count DESC, left ASC, right ASC)
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_freq:
            break
        merges.append((l, r, c))
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, wf
