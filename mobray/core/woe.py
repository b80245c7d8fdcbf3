"""Weight of Evidence / Information Value (MOBPY/core/utils.py:152-237)."""

from __future__ import annotations

from typing import Dict, Tuple, Union

import numpy as np

from mobray.config import EPSILON


def woe_iv(
    goods: np.ndarray,
    bads: np.ndarray,
    smoothing: float = 0.5,
    return_components: bool = False,
    epsilon: float = EPSILON,
) -> Union[Tuple[np.ndarray, np.ndarray], Dict[str, np.ndarray]]:
    """WoE = ln(good_rate/bad_rate) with Laplace smoothing; IV per bin.

    Zero-variation guard: if total goods or total bads is 0, returns
    zeros (MOBPY/core/utils.py:199-214). Rates are smoothed as
    (g + s) / (G + s*k) and the ratio clipped to [eps, 1/eps] before the
    log (MOBPY/core/utils.py:216-226).
    """
    goods = np.asarray(goods, dtype=float)
    bads = np.asarray(bads, dtype=float)

    total_goods = goods.sum()
    total_bads = bads.sum()

    if total_goods == 0 or total_bads == 0:
        zeros = np.zeros(len(goods))
        if return_components:
            return {
                "woe": zeros,
                "iv": zeros,
                "good_rate": zeros if total_goods == 0 else goods / total_goods,
                "bad_rate": zeros if total_bads == 0 else bads / total_bads,
            }
        return zeros, zeros

    good_rate = (goods + smoothing) / (total_goods + smoothing * len(goods))
    bad_rate = (bads + smoothing) / (total_bads + smoothing * len(bads))

    woe = np.log(np.clip(good_rate / bad_rate, epsilon, 1.0 / epsilon))
    iv_groups = (good_rate - bad_rate) * woe

    if return_components:
        return {
            "woe": woe,
            "iv": iv_groups,
            "good_rate": good_rate,
            "bad_rate": bad_rate,
            "total_iv": iv_groups.sum(),
        }
    return woe, iv_groups
