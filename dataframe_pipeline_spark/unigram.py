"""Distributed unigram-LM subword tokenizer (Kudo 2018 — the
SentencePiece unigram model; public algorithm) — trainer + tokenizer,
Spark-first.  Together with :mod:`bpe` this covers both production
subword tokenizer families (merge-based and likelihood-based).

Algorithm (hard-EM / Viterbi variant, deterministic):

1. **Seed**: every substring (length 1..``max_piece_len``) of the
   corpus vocabulary, weighted by word frequency × occurrence
   multiplicity; keep the ``seed_size`` most frequent plus ALL single
   characters (coverage guarantee).
2. **EM rounds**: E-step Viterbi-segments every distinct word under
   the current piece scores and accumulates piece counts weighted by
   word frequency; M-step re-derives scores from the counts (pieces
   that win no occurrences drop out; single characters are floored at
   count 1 so every word stays segmentable).
3. **Prune** to ``vocab_size``: all single characters + the most
   frequent multi-character pieces.

Scale design — the 100 TB story (same discipline as :mod:`bpe`):

* The ONLY corpus-scale pass is word-frequency extraction: one explode
  + one keyed shuffle.  Seeding, every EM round, and tokenization run
  on the bounded DISTINCT-WORD table (|vocab| rows, not |corpus|).
* The Viterbi DP is ONE ``aggregate`` HOF per word — pure whole-stage
  codegen, no Python in the segmentation path.  Piece scores ride as a
  literal map (bounded by ``seed_size``, the same plan-size class as
  the fitted-dictionary encoders).
* Each E-step is one explode + groupBy over the word table's piece
  lists; the collected piece-count table is at most ``seed_size`` rows
  (a fitted parameter, like centroids or BPE merges — never the data).

Determinism / oracle parity: piece log-probs are quantized
driver-side — ``round(log(count/total) * 1e6)`` as BIGINT — so the JVM
only ever does integer sums and comparisons in the DP, and the
pure-Python reference (:func:`reference_unigram`) reproduces the
distributed result bit-for-bit: same quantized scores (both sides
quantize in CPython), same ascending-``j`` strict-improvement
tie-break (= longest winning piece), same (count DESC, piece ASC)
prune order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log-prob quantization factor: scores are round(log(p) * QUANT) BIGINTs.
QUANT = 1_000_000

#: quantized penalty for a position not reachable via any vocab piece —
#: large enough that any all-pieces path beats any gap path, small
#: enough that len(word) gaps never overflow int64.
GAP = 100_000_000_000


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(__w, __f): corpus word frequencies — the one corpus-scale pass."""
    return (df.select(F.explode(F.split(F.col(text_col), " ")).alias("__w"))
            .filter(F.length("__w") > 0)
            .groupBy("__w").agg(F.count(F.lit(1)).alias("__f")))


def _viterbi_expr(word: str, score_map_sql: str, max_len: int) -> str:
    """SQL expression: array<string> of the best unigram segmentation
    of ``word`` (a column name) under the literal quantized-score map.

    Stored DP state is an array of ``(nc, b)`` structs per prefix
    length — ``nc`` the NEGATED best score (so ``array_sort`` picks the
    max-score / smallest-start candidate first), ``b`` the chosen piece
    start.  The map literal appears exactly ONCE (inside the candidate
    transform) and the DP array is LET-bound via the 1-element
    ``transform`` idiom before backtracking, so CollapseProject cannot
    inline the DP into every backtrack reference (the MinHash signature
    lesson, dedup.py:259).
    """
    w, L = word, max_len
    # candidate for prefix i via last piece w[j:i]: nc = nc[j] - score
    cand = (f"named_struct("
            f"'nc', element_at(acc, j + 1).nc - "
            f"coalesce(element_at({score_map_sql}, "
            f"substring({w}, j + 1, i - j)), {-GAP}L), "
            f"'b', j)")
    best_i = (f"element_at(array_sort(transform("
              f"sequence(greatest(0, i - {L}), i - 1), j -> {cand})), 1)")
    dp = (f"aggregate(sequence(1, length({w})), "
          f"array(named_struct('nc', 0L, 'b', -1)), "
          f"(acc, i) -> array_append(acc, {best_i}))")
    # backtrack: walk b-pointers from the full-word prefix; at most
    # length(w) steps, no-op once pos reaches 0
    step = (f"case when st.pos <= 0 then st else named_struct("
            f"'pos', element_at(best, st.pos + 1).b, "
            f"'out', array_append(st.out, substring({w}, "
            f"element_at(best, st.pos + 1).b + 1, "
            f"st.pos - element_at(best, st.pos + 1).b))) end")
    back = (f"aggregate(sequence(1, length({w})), "
            f"named_struct('pos', length({w}), "
            f"'out', cast(array() as array<string>)), "
            f"(st, _z) -> {step}, st -> reverse(st.out))")
    return f"transform(array({dp}), best -> {back})[0]"


def _score_map_sql(scores: dict[str, int]) -> str:
    items = sorted(scores.items())
    args = ", ".join(f"{_sql_str(p)}, {q}L" for p, q in items)
    return f"map({args})"


def quantized_scores(counts: dict[str, int]) -> dict[str, int]:
    """count dict -> quantized log-prob dict (CPython math.log on both
    the engine and oracle sides — the JVM never computes a float)."""
    total = sum(counts.values())
    return {p: round(math.log(c / total) * QUANT)
            for p, c in counts.items()}


class UnigramTrainer:
    """Fits the unigram vocabulary + quantized scores from a corpus."""

    def __init__(self, vocab_size: int = 120, seed_size: int = 400,
                 max_piece_len: int = 5, n_iters: int = 2):
        if vocab_size < 2 or seed_size < vocab_size:
            raise ValueError("need vocab_size >= 2 and "
                             "seed_size >= vocab_size")
        self.vocab_size = vocab_size
        self.seed_size = seed_size
        self.max_piece_len = max_piece_len
        self.n_iters = n_iters
        self.counts_: dict[str, int] | None = None
        self.scores_: dict[str, int] | None = None

    # -- fit stages (each a bounded aggregate over the word table) ------

    def _seed_counts(self, wf: DataFrame) -> dict[str, int]:
        """Substring frequencies (occurrence-multiplicity × word freq)
        over the distinct-word table; top seed_size + all chars."""
        L = self.max_piece_len
        subs = (f"flatten(transform(sequence(0, length(__w) - 1), i -> "
                f"transform(sequence(1, least({L}, length(__w) - i)), "
                f"l -> substring(__w, i + 1, l))))")
        base = (wf.select(F.col("__f"),
                          F.explode(F.expr(subs)).alias("__p"))
                .groupBy("__p").agg(F.sum("__f").alias("__c")))
        top = {r["__p"]: r["__c"] for r in
               base.orderBy(F.desc("__c"), F.asc("__p"))
               .limit(self.seed_size).collect()}
        # ALL single characters ride regardless of rank (coverage);
        # exact, not cutoff-dependent — a rare char must not vanish
        # just because seed_size common substrings outrank it.
        chars = {r["__p"]: r["__c"] for r in
                 base.filter(F.length("__p") == 1).collect()}
        top.update(chars)
        return top

    def _estep_counts(self, wf: DataFrame,
                      scores: dict[str, int]) -> dict[str, int]:
        """Viterbi-segment every distinct word, count winning pieces
        weighted by word frequency — one explode + groupBy."""
        pieces = _viterbi_expr("__w", _score_map_sql(scores),
                               self.max_piece_len)
        rows = (wf.select(F.col("__f"),
                          F.explode(F.expr(pieces)).alias("__p"))
                .groupBy("__p").agg(F.sum("__f").alias("__c"))
                .collect())
        counts = {r["__p"]: r["__c"] for r in rows}
        # coverage floor: every seed character survives with count >= 1
        for p in scores:
            if len(p) == 1:
                counts[p] = max(counts.get(p, 0), 1)
        return counts

    @staticmethod
    def prune(counts: dict[str, int], vocab_size: int) -> dict[str, int]:
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        keep = dict(multi[:max(0, vocab_size - len(chars))])
        keep.update(chars)
        return keep

    def fit(self, df: DataFrame, text_col: str = "text") -> "UnigramTrainer":
        from pyspark import StorageLevel

        wf = word_freqs(df, text_col).persist(StorageLevel.MEMORY_AND_DISK)
        wf.count()
        counts = self._seed_counts(wf)
        for _ in range(self.n_iters):
            counts = self._estep_counts(wf, quantized_scores(counts))
        self.counts_ = self.prune(counts, self.vocab_size)
        self.scores_ = quantized_scores(self.counts_)
        wf.unpersist()
        return self


class UnigramTokenizer:
    """Applies a fitted unigram vocabulary.  ``token_counts`` follows
    the distinct-word discipline (segment each distinct word once, join
    counts back by frequency); ``transform`` adds a per-row token array
    (full-width path, for pipelines that need the tokens in place)."""

    def __init__(self, scores: dict[str, int], max_piece_len: int = 5):
        if not scores:
            raise ValueError("empty unigram vocabulary")
        self.scores = dict(scores)
        self.max_piece_len = max_piece_len

    def _pieces_expr(self, word: str) -> str:
        return _viterbi_expr(word, _score_map_sql(self.scores),
                             self.max_piece_len)

    def token_counts(self, df: DataFrame,
                     text_col: str = "text") -> DataFrame:
        """(token, n) corpus subword frequencies — one word shuffle plus
        a vocab-sized segmentation pass."""
        wf = word_freqs(df, text_col)
        return (wf.select(F.col("__f"),
                          F.explode(F.expr(self._pieces_expr("__w")))
                          .alias("token"))
                .groupBy("token").agg(F.sum("__f").alias("n")))

    def transform(self, df: DataFrame, text_col: str = "text",
                  out_col: str = "tokens") -> DataFrame:
        """Per-row token array: each whitespace word segmented in place
        (flatten of per-word Viterbi — still zero Python).

        Empty words (consecutive / leading / trailing spaces make
        ``split`` emit '') are filtered BEFORE segmenting: the Viterbi
        expression's ``sequence(1, length(w))`` would otherwise become
        ``[1, 0]`` and index ``element_at(acc, 0)`` — matching the
        ``word_freqs`` discipline the trainer already applies."""
        per_word = self._pieces_expr("wd")
        expr = (f"flatten(transform("
                f"filter(split({text_col}, ' '), wd -> length(wd) > 0), "
                f"wd -> {per_word}))")
        return df.withColumn(out_col, F.expr(expr))


# -- pure-Python reference (oracle / parity tests) --------------------------

def _py_viterbi(word: str, scores: dict[str, int], max_len: int) -> list[str]:
    """Reference DP: identical integer scores, identical ascending-j
    strict-improvement tie-break as the SQL expression."""
    n = len(word)
    nc = [0] + [None] * n          # negated best score per prefix
    back = [-1] * (n + 1)
    for i in range(1, n + 1):
        best_nc, best_b = None, -1
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            s = scores.get(piece)
            c = nc[j] - (s if s is not None else -GAP)
            # array_sort picks (min nc, then min b): strict < keeps the
            # first (smallest-j) candidate on ties
            if best_nc is None or c < best_nc:
                best_nc, best_b = c, j
        nc[i], back[i] = best_nc, best_b
    out, pos = [], n
    while pos > 0:
        out.append(word[back[pos]:pos])
        pos = back[pos]
    return list(reversed(out))


def reference_unigram(texts: list[str], vocab_size: int = 120,
                      seed_size: int = 400, max_piece_len: int = 5,
                      n_iters: int = 2):
    """Independent replica of trainer + token_counts.  Returns
    (final_counts, token_counts) — the oracle generator embeds the
    token counts as a VALUES literal."""
    from collections import Counter

    wf: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    seed: Counter = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i:i + l]] += f
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    counts = dict(sorted(seed.items(),
                         key=lambda kv: (-kv[1], kv[0]))[:seed_size])
    counts.update(chars)
    for _ in range(n_iters):
        scores = quantized_scores(counts)
        new: Counter = Counter()
        for w, f in wf.items():
            for p in _py_viterbi(w, scores, max_piece_len):
                new[p] += f
        counts = dict(new)
        for p in scores:
            if len(p) == 1:
                counts[p] = max(counts.get(p, 0), 1)
    final = UnigramTrainer.prune(counts, vocab_size)
    scores = quantized_scores(final)
    toks: Counter = Counter()
    for w, f in wf.items():
        for p in _py_viterbi(w, scores, max_piece_len):
            toks[p] += f
    return final, dict(toks)
