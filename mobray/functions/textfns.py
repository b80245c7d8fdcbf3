"""Text-analysis kernels: tokenization, quality metrics, language ID,
fingerprinting. Pure functions over pandas Series / numpy arrays so the
stages stay vectorized (compiled regexes at module import)."""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mobray.functions.hashing import stable_hash64

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2-style contraction/word/number/symbol split, simplified)
BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")
WS_RE = re.compile(r"\S+")
PUNCT_RE = re.compile(r"[^\w\s]")
DIGIT_RE = re.compile(r"[0-9]")

# small per-language stopword tables for the n-gram/stopword heuristic
STOPWORDS: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "on", "with", "as", "was", "at"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine", "auf", "für"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "los", "las"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "en", "un", "une", "du", "que", "pour", "dans"},
}

# ONE compiled alternation per language: counting matches of
# \b(?:w1|w2|...)\b equals the sum of per-word \b-bounded counts (the
# words are distinct whole tokens, and a shorter alternative that fails
# its trailing \b backtracks into the longer one — e.g. 'de' vs 'des'),
# but scans the text once per LANGUAGE instead of once per word
# (4 regex passes per batch instead of ~57).
_STOP_RES: Dict[str, "re.Pattern"] = {
    lang: re.compile(
        r"\b(?:"
        + "|".join(sorted((re.escape(w) for w in words), key=len, reverse=True))
        + r")\b"
    )
    for lang, words in STOPWORDS.items()
}


def tokenize_lower_batch(col) -> Tuple[np.ndarray, np.ndarray]:
    """Batched lowercase whitespace tokenization: returns (flat object
    ndarray of tokens, int64 per-doc start offsets), token-identical to
    per-row ``(t or "").lower().split()``.

    All-ASCII batches (the common case; every driver fixture is ASCII)
    run entirely in Arrow C kernels — ascii_lower + trim + split — with
    the one divergence patched: an empty/whitespace-only doc splits to
    ``['']`` where Python gives ``[]``, so those empty tokens are dropped
    and the doc's count zeroed. Batches containing non-ASCII text fall
    back to the exact per-row Python path, because utf8_lower and
    str.lower disagree on e.g. 'İ' (Arrow: 'i', Python: 'i\\u0307') and
    the dedup oracles mirror the Python semantics."""
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(pd.Series(col), from_pandas=True)
    if pa.types.is_null(col.type):
        # an all-null column infers the null type, which no utf8 kernel
        # accepts — it is just n empty docs
        col = col.cast(pa.string())
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    filled = pc.fill_null(col, "")
    if pc.min(pc.string_is_ascii(filled)).as_py():
        trimmed = pc.utf8_trim_whitespace(pc.ascii_lower(filled))
        split = pc.utf8_split_whitespace(trimmed)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        counts = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        counts = counts.astype(np.int64)
        toks = split.flatten().to_numpy(zero_copy_only=False)
        empty_doc = pc.equal(trimmed, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        if empty_doc.any():
            # each empty doc contributed exactly one '' token (split
            # collapses runs, so a real token is never empty)
            counts[empty_doc] = 0
            toks = toks[toks != ""]
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        return toks, offsets
    texts = filled.to_pylist()
    toks_l: list = []
    offsets = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        offsets[i] = len(toks_l)
        toks_l.extend(t.lower().split())
    return np.asarray(toks_l, dtype=object), offsets


def ws_token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count (vectorized)."""
    return texts.str.count(WS_RE).fillna(0).to_numpy(dtype=np.int64)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish pre-token count (vectorized regex count)."""
    return texts.str.count(BPE_RE).fillna(0).to_numpy(dtype=np.int64)


def quality_metrics(texts: pd.Series) -> Dict[str, np.ndarray]:
    """Length / punctuation / digit / stopword / word-length metrics and a
    composite [0, 1] quality score (heuristic in the Gopher/C4 family:
    penalize very short docs, high symbol density, missing stopwords)."""
    n_chars = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_tokens = ws_token_count(texts)
    n_punct = texts.str.count(PUNCT_RE).fillna(0).to_numpy(dtype=np.int64)
    n_digit = texts.str.count(DIGIT_RE).fillna(0).to_numpy(dtype=np.int64)

    safe_chars = np.maximum(n_chars, 1)
    safe_tokens = np.maximum(n_tokens, 1)
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    mean_word_len = (n_chars - (n_tokens - 1).clip(min=0)) / safe_tokens

    lower = texts.str.lower()
    en_stop = lower.str.count(_STOP_RES["en"]).fillna(0).to_numpy(dtype=np.int64)
    stop_ratio = en_stop / safe_tokens

    score = (
        np.clip(n_tokens / 50.0, 0, 1) * 0.4
        + np.clip(1.0 - 4.0 * punct_ratio, 0, 1) * 0.2
        + np.clip(1.0 - 4.0 * digit_ratio, 0, 1) * 0.2
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.2
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "mean_word_len": mean_word_len,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def detect_language(texts: pd.Series) -> np.ndarray:
    """Stopword-frequency language ID over the STOPWORDS tables; 'und'
    (undetermined) when no language scores above zero. One vectorized
    alternation-regex count per LANGUAGE (see ``_STOP_RES``) — count
    totals are identical to the old per-word sum."""
    lower = texts.str.lower()
    n_tokens = np.maximum(ws_token_count(texts), 1)
    langs = list(STOPWORDS)
    scores = np.zeros((len(texts), len(langs)))
    for j, lang in enumerate(langs):
        hits = lower.str.count(_STOP_RES[lang]).fillna(0).to_numpy(dtype=np.int64)
        scores[:, j] = hits / n_tokens
    best = scores.argmax(axis=1)
    out = np.array([langs[b] for b in best], dtype=object)
    out[scores.max(axis=1) <= 0.0] = "und"
    return out


def rolling_fingerprint(texts, window: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: min over rolling-window
    hashes of the token stream -> int64. Robust to local edits outside
    the minimizing window; cheap enough for a dedup pre-key. ``texts``
    is a pandas Series or an Arrow string array/chunked array (anything
    ``tokenize_lower_batch`` accepts).

    Fully batched: ONE stable_hash64 over the batch's concatenated
    tokens, one global sliding-window polynomial combine, and per-doc
    mins via ``np.minimum.reduceat`` on (start, end) index pairs so
    windows never straddle a document boundary (the same pattern as the
    minhash signature kernel)."""
    mask = np.uint64(0x7FFFFFFFFFFFFFFF)
    out = np.zeros(len(texts), dtype=np.int64)
    all_toks, offsets = tokenize_lower_batch(texts)
    total = len(all_toks)
    if total == 0:
        return out
    th = stable_hash64(all_toks)
    counts = np.diff(np.append(offsets, total))

    # docs with <= window tokens: fingerprint = min raw token hash.
    # reduceat over nonempty-doc starts segments th exactly per doc
    # (empty docs contribute no tokens, so consecutive nonempty starts
    # bound each doc's token run)
    ne_idx = np.flatnonzero(counts > 0)
    raw_min = np.minimum.reduceat(th, offsets[ne_idx])
    small = counts[ne_idx] <= window
    out[ne_idx[small]] = (raw_min[small] & mask).astype(np.int64)

    big_idx = np.flatnonzero(counts > window)
    if len(big_idx) == 0:
        return out
    # one global rolling polynomial combine; windows crossing document
    # boundaries exist in `combined` but are excluded by the per-doc
    # (start, end) reduceat pairs below
    w = np.lib.stride_tricks.sliding_window_view(th, window)
    combined = w[:, 0].copy()
    for k in range(1, window):
        combined *= np.uint64(1099511628211)
        combined += w[:, k]
    starts = offsets[big_idx]
    ends = starts + counts[big_idx] - window + 1  # one past last valid start
    idx = np.empty(2 * len(big_idx), dtype=np.int64)
    idx[0::2] = starts
    idx[1::2] = ends
    if idx[-1] >= len(combined):
        # reduceat indices must be in-bounds; the final slice runs to the
        # array end implicitly when its end index is dropped
        idx = idx[:-1]
    mins = np.minimum.reduceat(combined, idx)[0::2]
    out[big_idx] = (mins & mask).astype(np.int64)
    return out
