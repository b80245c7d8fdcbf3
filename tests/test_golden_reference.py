"""Golden parity with the reference's published worked example.

The reference README (README.md:43-77 and :119-124) publishes the full
summary table for German credit `Durationinmonth` vs `default` under
constraints (min_bins=4, max_bins=6, min_samples=0.05,
min_positives=0.01): 4 bins with exact counts/means/WoE/IV and
"PAVA blocks: 10 -> Final bins: 4". Our engine reproduces it
digit-for-digit. Skipped when the reference data dir is absent (the
engine itself has no dependency on it)."""

import os

import numpy as np
import pandas as pd
import pytest

from mobray.core.binner import fit_binning
from mobray.core.constraints import BinningConstraints

DATA = "/root/reference/data"

GOLDEN = pd.DataFrame(
    {
        "bucket": ["(-inf, 9)", "[9, 16)", "[16, 45)", "[45, +inf)"],
        "count": [94, 337, 499, 70],
        "count_pct": [9.4, 33.7, 49.9, 7.0],
        "sum": [10.0, 79.0, 171.0, 40.0],
        "mean": [0.106383, 0.234421, 0.342685, 0.571429],
        "std": [0.309980, 0.424267, 0.475084, 0.498445],
        "woe": [1.241870, 0.335632, -0.193553, -1.127082],
        "iv": [0.106307, 0.035238, 0.019342, 0.102180],
    }
)


@pytest.mark.skipif(
    not os.path.exists(f"{DATA}/german_data_credit_cat.csv"),
    reason="reference data not available",
)
class TestGermanCreditGolden:
    @pytest.fixture(scope="class")
    def model(self):
        df = pd.read_csv(f"{DATA}/german_data_credit_cat.csv")
        df["default"] = df["default"] - 1  # original coding is 1/2
        c = BinningConstraints(
            min_bins=4, max_bins=6, min_samples=0.05, min_positives=0.01
        )
        return fit_binning(
            df["Durationinmonth"].to_numpy(float),
            df["default"].to_numpy(float),
            constraints=c,
        )

    def test_reproduces_published_table(self, model):
        s = model.summary_df()
        assert list(s["bucket"]) == list(GOLDEN["bucket"])
        np.testing.assert_array_equal(s["count"], GOLDEN["count"])
        np.testing.assert_allclose(s["count_pct"], GOLDEN["count_pct"], atol=1e-9)
        np.testing.assert_allclose(s["sum"], GOLDEN["sum"], atol=1e-9)
        np.testing.assert_allclose(s["mean"], GOLDEN["mean"], atol=5e-7)
        np.testing.assert_allclose(s["std"], GOLDEN["std"], atol=5e-7)
        np.testing.assert_allclose(s["woe"], GOLDEN["woe"], atol=5e-7)
        np.testing.assert_allclose(s["iv"], GOLDEN["iv"], atol=5e-7)

    def test_total_iv(self, model):
        # README: total IV ~= 0.263
        assert model.total_iv() == pytest.approx(0.263066, abs=1e-5)

    def test_pava_compression(self, model):
        # README: "PAVA blocks: 10 / Final bins: 4"
        assert model.diagnostics["n_pava_blocks"] == 10
        assert model.n_bins == 4

    def test_distributed_fit_matches_golden(self, ray_session, model):
        import ray.data

        df = pd.read_csv(f"{DATA}/german_data_credit_cat.csv")
        df["default"] = (df["default"] - 1).astype(float)
        df["Durationinmonth"] = df["Durationinmonth"].astype(float)
        from mobray.pipelines.fit import fit_dataset

        c = BinningConstraints(
            min_bins=4, max_bins=6, min_samples=0.05, min_positives=0.01
        )
        dist = fit_dataset(
            ray.data.from_pandas(df[["Durationinmonth", "default"]]).repartition(4),
            "Durationinmonth",
            "default",
            constraints=c,
        )
        np.testing.assert_allclose(dist.woe, model.woe, rtol=1e-9)
        assert dist.labels == model.labels


@pytest.mark.skipif(
    not os.path.exists(f"{DATA}/testMono.csv"), reason="reference data not available"
)
def test_testmono_v_shape():
    """data/testMono.csv: the reference's V-shaped non-monotone fixture."""
    df = pd.read_csv(f"{DATA}/testMono.csv")
    xcol, ycol = df.columns[:2]
    model = fit_binning(df[xcol].to_numpy(float), df[ycol].to_numpy(float))
    diffs = np.diff(model.means)
    assert np.all(diffs >= -1e-10) or np.all(diffs <= 1e-10)
    assert model.counts.sum() == len(df)


@pytest.mark.skipif(
    not os.path.exists(f"{DATA}/insurance2.csv"), reason="reference data not available"
)
def test_insurance_binary_and_continuous():
    """data/insurance2.csv: binary insuranceclaim target over age, plus a
    continuous-target fit over charges (no WoE columns)."""
    df = pd.read_csv(f"{DATA}/insurance2.csv")
    m = fit_binning(df["age"].to_numpy(float), df["insuranceclaim"].to_numpy(float))
    assert m.is_binary
    assert "woe" in m.summary_df().columns
    m2 = fit_binning(df["age"].to_numpy(float), df["charges"].to_numpy(float))
    assert not m2.is_binary
    assert "woe" not in m2.summary_df().columns
