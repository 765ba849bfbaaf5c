"""Text-analysis operators for training-data curation.

Beyond-reference surface (the reference has no text analytics): token
counting, quality scoring, n-gram/stopword language ID, and document
fingerprinting.  All pure Catalyst column expressions — each operator is
embarrassingly parallel, shuffle-free, and runs inside whole-stage
codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32_expr

#: BPE-ish lexer: letter runs, digit runs, or single non-alnum glyphs.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "la", "los", "de", "que", "es", "una"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

#: English stopword subset used by the quality score.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "on", "for")


class TokenCounter:
    """Whitespace token count + BPE-ish regex token count + a chars/4
    subword estimate (the classic LLM rule of thumb)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)
        t = self.text_col
        return df.withColumns({
            "ws_tokens": F.size(F.split(F.col(t), " ")).cast("long"),
            "re_tokens": F.size(
                F.expr(f"regexp_extract_all({t}, '{TOKEN_REGEX}', 0)")).cast("long"),
            "subword_est": F.ceil(F.length(t) / 4).cast("long"),
        })


class QualityScorer:
    """Heuristic document quality: length, mean word length, stopword
    ratio, alpha ratio — combined into one [0,1]-ish score.

    All ratios are exact-integer numerators/denominators so a SQL oracle
    reproduces them bit-for-bit; only the final divisions are fp.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)
        t = self.text_col
        toks = f"split({t}, ' ')"
        stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
        n_tok = F.expr(f"size({toks})")
        n_stop = F.expr(
            f"size(filter({toks}, x -> x in ({stop_list})))")
        n_alpha = F.expr(f"length(regexp_replace({t}, '[^a-z]', ''))")
        out = df.withColumns({
            "n_chars_m": F.length(t).cast("long"),
            "n_tokens": n_tok.cast("long"),
            "mean_tok_len": F.round(
                (F.length(t) - n_tok + 1) / n_tok, 6),
            "stopword_ratio": F.round(n_stop / n_tok, 6),
            "alpha_ratio": F.round(n_alpha / F.length(t), 6),
        })
        score = (
            F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.25
            + F.col("alpha_ratio") * 0.5
            + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.25
        )
        # floor-based 6-decimal round: unlike ROUND(), whose half-way
        # tie-breaking differs between engines, floor(x*1e6+0.5) is the
        # same IEEE op sequence everywhere.
        return out.withColumn(
            "quality_score", F.floor(score * 1000000 + 0.5) / 1000000.0)


class LanguageIdentifier:
    """Marker-lexicon language ID: score = marker-token hits per
    language, predict the argmax (ties broken alphabetically).

    The real-data analog drops in richer lexicons / char-n-gram tables
    via the same ``markers`` dict; the mechanism (per-row filter+size,
    greatest-of-scores) is unchanged and shuffle-free.
    """

    def __init__(self, text_col: str = "text",
                 markers: dict[str, tuple[str, ...]] | None = None):
        self.text_col = text_col
        self.markers = markers or LANG_MARKERS

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)
        toks = f"split({self.text_col}, ' ')"
        scores = {}
        for lang, words in sorted(self.markers.items()):
            lst = ", ".join(f"'{w}'" for w in words)
            scores[lang] = F.expr(f"size(filter({toks}, x -> x in ({lst})))")
        # argmax with alphabetical tie-break: fold over sorted langs,
        # strictly-greater replaces — first (alphabetical) max wins.
        pred = None
        best = None
        for lang in sorted(scores):
            if pred is None:
                pred, best = F.lit(lang), scores[lang]
            else:
                cond = scores[lang] > best
                pred = F.when(cond, F.lit(lang)).otherwise(pred)
                best = F.when(cond, scores[lang]).otherwise(best)
        out = df
        for lang in sorted(scores):
            out = out.withColumn(f"score_{lang}", scores[lang].cast("long"))
        return out.withColumn("pred_lang", pred)


#: PII patterns: ERE-only (no lookarounds/shorthand), portable across
#: Spark's Java regex and DuckDB's RE2.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- .]?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


class Redactor:
    """PII scrubbing for training corpora: each pattern is replaced by a
    typed placeholder (``<EMAIL>`` …) via chained ``regexp_replace`` —
    per-row, shuffle-free, codegen'd.  Patterns are ERE-portable so the
    same redaction replays in any engine."""

    def __init__(self, text_col: str = "text",
                 patterns: dict[str, str] | None = None,
                 output: str = "redacted"):
        self.text_col = text_col
        self.patterns = patterns or PII_PATTERNS
        self.output = output

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)
        out = F.col(self.text_col)
        for name, pat in self.patterns.items():
            out = F.regexp_replace(out, pat, f"<{name.upper()}>")
        return df.withColumn(self.output, out)


class TermFrequency:
    """Corpus term statistics: explode tokens → count + doc-frequency per
    term.  The one genuinely shuffle-bearing text op (keyed by term);
    partial aggregation combines map-side, and ``min_count`` prunes the
    long tail before any join against it."""

    def __init__(self, text_col: str = "text", min_count: int = 1):
        self.text_col = text_col
        self.min_count = min_count

    def transform(self, df: DataFrame, id_col: str = "doc_id") -> DataFrame:
        from .dedup import spread

        tok = spread(df).select(
            F.col(id_col),
            F.explode(F.split(F.col(self.text_col), " ")).alias("term"))
        return (
            tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.count_distinct(id_col).alias("df"))
            .filter(F.col("tf") >= self.min_count)
        )


class RepetitionScorer:
    """Gopher/C4-style repetition signals: fraction of duplicate word
    bigrams and the share taken by the single most-frequent bigram —
    the standard filters for boilerplate / keyword-stuffed / looping
    documents in LLM training-data curation.

    Shuffle-free per-row HOF expressions like the rest of this module;
    the occurrence-count step is O(distinct × total) per document,
    fine for natural documents (≤ thousands of tokens).  A pathological
    million-token document would instead use the TermFrequency-style
    explode → groupBy(doc, gram) shape — same results, one shuffle.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)       # CPU-bound per-row kernel: use every core
        toks = f"split({self.text_col}, ' ')"
        bg = (f"case when size({toks}) < 2 then array() else "
              f"transform(sequence(1, size({toks}) - 1), "
              f"i -> concat(element_at({toks}, i), ' ', "
              f"element_at({toks}, i + 1))) end")
        counts = (f"transform(array_distinct(__bg), d -> "
                  f"size(filter(__bg, x -> x = d)))")
        zero = "cast(0.0 as double)"
        return (
            df.withColumn("__bg", F.expr(bg))
            .withColumns({
                "n_bigrams": F.expr("size(__bg)").cast("long"),
                "distinct_bigrams":
                    F.expr("size(array_distinct(__bg))").cast("long"),
                "dup_bigram_ratio": F.expr(
                    f"case when size(__bg) = 0 then {zero} else "
                    f"round((size(__bg) - size(array_distinct(__bg))) "
                    f"/ size(__bg), 6) end"),
                "top_bigram_frac": F.expr(
                    f"case when size(__bg) = 0 then {zero} else "
                    f"round(array_max({counts}) / size(__bg), 6) end"),
            })
            .drop("__bg")
        )


class ContaminationChecker:
    """Benchmark decontamination: flag corpus documents that share any
    word ``n``-gram with a benchmark/eval set — the step an LLM data
    pipeline runs so test sets don't leak into training data.

    Plan: the benchmark side (small by construction — eval sets are
    thousands of docs, not billions) is reduced to its distinct shingle
    set and **broadcast**; the corpus side explodes shingles map-side
    and semi-joins against it, then aggregates matches per doc — so the
    100 TB corpus is never shuffled, only scanned.  Shingling is the
    same md5-free ``shingle_expr`` the dedup operators use, so a SQL
    oracle replays it exactly.
    """

    def __init__(self, n: int = 5):
        self.n = n

    def flag(self, corpus: DataFrame, benchmark: DataFrame,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """(id, n_shared) for every corpus doc sharing ≥1 shingle."""
        from .dedup import shingle_expr, spread

        cs = spread(corpus).select(
            F.col(id_col),
            F.explode(shingle_expr(text_col, self.n)).alias("__s"))
        bs = (benchmark
              .select(F.explode(shingle_expr(text_col, self.n)).alias("__s"))
              .distinct())
        return (
            cs.join(F.broadcast(bs), "__s")
            .groupBy(id_col)
            .agg(F.count_distinct("__s").alias("n_shared"))
        )


class Fingerprinter:
    """Deterministic document fingerprints: a normalized-content md5 and
    a position-weighted polynomial token hash (rolling-hash style).

    fp_roll = Σ_i h32(token_i) * (2i+1)  mod 2^31-1   (i is 0-based)
    — order-sensitive (unlike a bag hash) yet exactly reproducible in
    any engine with integer arithmetic.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def transform(self, df: DataFrame) -> DataFrame:
        from .dedup import spread

        df = spread(df)
        t = self.text_col
        norm = f"lower(regexp_replace({t}, '\\\\s+', ' '))"
        toks = f"split({norm}, ' ')"
        weighted = (f"transform({toks}, (x, i) -> "
                    f"{h32_expr('x')} * (2L*i + 1L))")
        roll = (f"aggregate({weighted}, 0L, (acc, v) -> acc + v) "
                f"% 2147483647L")
        return df.withColumns({
            "fp_md5": F.expr(f"md5({norm})"),
            "fp_roll": F.expr(roll),
        })
