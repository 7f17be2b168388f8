"""Text analysis operators: language ID (stopword-hit heuristic), quality
scoring, token counting (whitespace + a BPE-ish regex), and document
fingerprinting (rolling polynomial hash). All JVM-side Column expressions
except the rolling hash (Arrow-batched numpy — sequential per document but
vectorized across the batch dimension)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword inventories — enough signal for a heuristic lang id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}

# BPE-ish token regex: words / numbers / single punctuation, the usual
# pre-tokenizer shape
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_lang_id(docs_df: DataFrame, text_col: str = "text") -> DataFrame:
    """lang_guess = argmax over languages of stopword hits (ties
    alphabetical → deterministic). Pure Column ops: one split + array
    intersections against literal arrays."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    hit_cols = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in sorted(STOPWORDS.items())
    }
    out = docs_df
    for lang, c in hit_cols.items():
        out = out.withColumn(f"_hits_{lang}", c)
    # argmax with alphabetical tie-break
    best = None
    for lang in sorted(STOPWORDS):
        this = F.struct(F.col(f"_hits_{lang}").alias("hits"),
                        F.lit(lang).alias("lang"))
        best = this if best is None else F.when(
            (this["hits"] > best["hits"]), this
        ).otherwise(best)
    out = out.withColumn(
        "lang_guess",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    )
    return out.drop(*[f"_hits_{lang}" for lang in STOPWORDS])


def with_quality(docs_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + a composite score: token count, mean token length,
    alpha/space/punct ratios, stopword ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace(t, "[^ ]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    en_hits = F.size(F.array_intersect(
        F.split(F.lower(t), r"\s+"),
        F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
    ))
    return (
        docs_df.withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len",
                    (n_chars - n_space) / F.greatest(n_tokens, F.lit(1)))
        .withColumn("alpha_ratio", n_alpha / F.greatest(n_chars, F.lit(1)))
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("stopword_ratio", en_hits / F.greatest(n_tokens, F.lit(1)))
        .withColumn(
            "quality_score",
            (F.col("alpha_ratio") * 0.5
             + F.col("stopword_ratio") * 0.3
             + (1.0 - F.col("punct_ratio")) * 0.2),
        )
    )


def with_token_counts(docs_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens, both JVM-side.

    The regex goes through ``F.lit`` (not an ``F.expr`` string literal —
    Spark SQL unescapes ``\\s`` inside single quotes, silently turning the
    whitespace class into a literal ``s``; caught by the token_counts
    driver oracle)."""
    t = F.col(text_col)
    return (
        docs_df.withColumn("ws_tokens", F.size(F.split(F.trim(t), r"\s+")))
        .withColumn("bpe_tokens",
                    F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), F.lit(0))))
    )


_POLY_BASE = np.uint64(1099511628211)  # FNV prime doubles as the poly base


def rolling_fingerprints(texts: pd.Series, window: int = 16) -> pd.DataFrame:
    """Document fingerprinting: polynomial rolling hash over codepoints,
    winnowed to the MIN hash per non-overlapping window — a compact
    shift-resistant signature set."""
    out_doc, out_fp = [], []
    with np.errstate(over="ignore"):
        pow_w = _POLY_BASE ** np.uint64(window)
        for di, text in enumerate(texts):
            cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            if len(cps) < window:
                out_doc.append(di)
                out_fp.append(int(cps.sum()) if len(cps) else 0)
                continue
            # rolling: h[i+1] = h[i]*B + c[i+w] - c[i]*B^w
            powers = np.empty(window, dtype=np.uint64)
            powers[0] = np.uint64(1)
            for j in range(1, window):
                powers[j] = powers[j - 1] * _POLY_BASE
            first = (cps[:window][::-1] * powers).sum()
            n = len(cps) - window + 1
            hs = np.empty(n, dtype=np.uint64)
            hs[0] = first
            for i in range(1, n):
                hs[i] = hs[i - 1] * _POLY_BASE + cps[i + window - 1] - cps[i - 1] * pow_w
            # winnow: min per non-overlapping window of hashes
            n_win = (n + window - 1) // window
            for wdx in range(n_win):
                seg = hs[wdx * window:(wdx + 1) * window]
                out_doc.append(di)
                out_fp.append(int(seg.min().astype(np.int64)))
    return pd.DataFrame({"idx": out_doc, "fingerprint": out_fp})


def with_fingerprints(docs_df: DataFrame, text_col: str = "text",
                      window: int = 16) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = rolling_fingerprints(pdf[text_col], window)
            fps["doc_id"] = pdf["doc_id"].values[fps["idx"].values]
            yield fps[["doc_id", "fingerprint"]]

    return docs_df.select("doc_id", text_col).mapInPandas(
        gen, schema="doc_id long, fingerprint long"
    )
