"""Immutable fitted-binning artifact.

The reference keeps fitted state as mutable fields on the
``MonotonicBinner`` instance (MOBPY/binning/mob.py:160-171). For a
distributed engine the fitted result must be a small, serializable value
object that can be ``ray.put`` once and read inside every scoring task —
this is that object.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass(frozen=True)
class BinningModel:
    """Fitted monotone binning: edges + per-bin stats + WoE map + metadata.

    Bins are half-open ``[left, right)``; first left is -inf, last right
    is +inf (full real-line coverage, MOBPY/binning/mob.py:545-591).
    """

    lefts: np.ndarray       # float64, per final bin
    rights: np.ndarray
    counts: np.ndarray      # int64
    sums: np.ndarray
    means: np.ndarray
    stds: np.ndarray
    mins: np.ndarray
    maxs: np.ndarray
    labels: List[str]       # byte-identical to reference _format_edge labels
    sign: str               # resolved '+' or '-'
    is_binary: bool
    woe: Optional[np.ndarray] = None   # aligned with bins; None if not binary
    iv: Optional[np.ndarray] = None
    exclude_values: frozenset = field(default_factory=frozenset)
    # Extra summary rows ("Missing", "Excluded:{v}") as plain dicts with
    # keys bucket/count/sum/mean/std/min/max (MOBPY/binning/mob.py:628-653).
    special_rows: tuple = ()
    diagnostics: Dict[str, Any] = field(default_factory=dict)

    @property
    def n_bins(self) -> int:
        return len(self.lefts)

    def bins_df(self):
        """bins_ table (numeric bins only), schema per
        MOBPY/binning/mob.py:307-335."""
        import pandas as pd

        return pd.DataFrame(
            {
                "left": self.lefts,
                "right": self.rights,
                "n": self.counts,
                "sum": self.sums,
                "mean": self.means,
                "std": self.stds,
                "min": self.mins,
                "max": self.maxs,
            }
        )

    def summary_df(self):
        """summary_ table incl. Missing/Excluded rows and WoE/IV for
        binary targets (MOBPY/binning/mob.py:593-706)."""
        import pandas as pd

        rows = []
        for i in range(self.n_bins):
            rows.append(
                {
                    "bucket": self.labels[i],
                    "count": int(self.counts[i]),
                    "sum": float(self.sums[i]),
                    "mean": float(self.means[i]),
                    "std": float(self.stds[i]),
                    "min": float(self.mins[i]),
                    "max": float(self.maxs[i]),
                }
            )
        rows.extend(dict(r) for r in self.special_rows)
        summary = pd.DataFrame(rows)
        total = summary["count"].sum()
        summary["count_pct"] = summary["count"] / total * 100

        base_cols = ["bucket", "count", "count_pct", "sum", "mean", "std", "min", "max"]
        if self.is_binary:
            woe_col = np.full(len(summary), np.nan)
            iv_col = np.zeros(len(summary))
            woe_col[: self.n_bins] = self.woe
            iv_col[: self.n_bins] = self.iv
            summary["woe"] = woe_col
            summary["iv"] = iv_col
            base_cols.extend(["woe", "iv"])
        return summary[base_cols]

    def total_iv(self) -> float:
        return float(self.iv.sum()) if self.iv is not None else 0.0

    def to_dict(self) -> Dict[str, Any]:
        def _f(v: float):
            if math.isinf(v):
                return "inf" if v > 0 else "-inf"
            if isinstance(v, float) and math.isnan(v):
                return "nan"
            return v

        return {
            "lefts": [_f(float(v)) for v in self.lefts],
            "rights": [_f(float(v)) for v in self.rights],
            "counts": [int(v) for v in self.counts],
            "sums": [float(v) for v in self.sums],
            "means": [float(v) for v in self.means],
            "stds": [float(v) for v in self.stds],
            "mins": [_f(float(v)) for v in self.mins],
            "maxs": [_f(float(v)) for v in self.maxs],
            "labels": list(self.labels),
            "sign": self.sign,
            "is_binary": self.is_binary,
            "woe": None if self.woe is None else [float(v) for v in self.woe],
            "iv": None if self.iv is None else [float(v) for v in self.iv],
            "exclude_values": sorted(self.exclude_values),
            "special_rows": [
                {k: _f(v) if isinstance(v, float) else v for k, v in r.items()}
                for r in self.special_rows
            ],
            "diagnostics": self.diagnostics,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "BinningModel":
        def _uf(v):
            if v == "inf":
                return float("inf")
            if v == "-inf":
                return float("-inf")
            if v == "nan":
                return float("nan")
            return float(v)

        return BinningModel(
            lefts=np.array([_uf(v) for v in d["lefts"]], dtype=float),
            rights=np.array([_uf(v) for v in d["rights"]], dtype=float),
            counts=np.array(d["counts"], dtype=np.int64),
            sums=np.array(d["sums"], dtype=float),
            means=np.array(d["means"], dtype=float),
            stds=np.array(d["stds"], dtype=float),
            mins=np.array([_uf(v) for v in d["mins"]], dtype=float),
            maxs=np.array([_uf(v) for v in d["maxs"]], dtype=float),
            labels=list(d["labels"]),
            sign=d["sign"],
            is_binary=d["is_binary"],
            woe=None if d.get("woe") is None else np.array(d["woe"], dtype=float),
            iv=None if d.get("iv") is None else np.array(d["iv"], dtype=float),
            exclude_values=frozenset(d.get("exclude_values", [])),
            special_rows=tuple(
                {k: (_uf(v) if isinstance(v, str) and v in ("inf", "-inf", "nan") else v) for k, v in r.items()}
                for r in d.get("special_rows", [])
            ),
            diagnostics=d.get("diagnostics", {}),
        )

    @staticmethod
    def from_json(s: str) -> "BinningModel":
        return BinningModel.from_dict(json.loads(s))
