"""Text-analysis map_batches stages over a documents table.

``TextAnalysisStage`` is a callable class (actor pool) because the
regexes/stopword tables are compiled once per actor; for small tables a
plain-function stage works too (Ray treats the class form as stateful).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from mobray.functions.textfns import (
    bpe_token_count,
    detect_language,
    quality_metrics,
    rolling_fingerprint,
    ws_token_count,
)


class TextAnalysisStage:
    """Appends token counts, quality metrics, predicted language and a
    winnowing fingerprint to a text column."""

    def __init__(self, text_col: str = "text", fingerprint_window: int = 8):
        self.text_col = text_col
        self.window = fingerprint_window

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[self.text_col].to_pylist(), dtype=object)
        q = quality_metrics(texts)
        batch = batch.append_column("n_ws_tokens", pa.array(ws_token_count(texts)))
        batch = batch.append_column("n_bpe_tokens", pa.array(bpe_token_count(texts)))
        for name in ("punct_ratio", "digit_ratio", "mean_word_len", "stopword_ratio", "quality_score"):
            batch = batch.append_column(name, pa.array(q[name], pa.float64()))
        batch = batch.append_column(
            "lang_pred", pa.array(detect_language(texts).tolist(), pa.string())
        )
        batch = batch.append_column(
            "fingerprint", pa.array(rolling_fingerprint(texts, self.window), pa.int64())
        )
        return batch
