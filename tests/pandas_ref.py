"""Independent pandas/numpy implementation of the significance-pipeline
DATAFLOW (SURVEY.md §5.2 layer 3).

Mirrors the reference's pandas-vectorized shape [P pFitHiC]: groupby /
cumsum / merge — deliberately NOT the Spark code path.  It shares only
the numeric kernels in pfithic_spark.stats (which have their own mpmath
gate), so a match between this and the Spark pipeline validates the
distributed dataflow: binning, joins, prior rules, BH ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pfithic_spark import stats as st

BIAS_LO, BIAS_HI = 0.5, 2.0


def run_significance_pandas(
    contacts: pd.DataFrame,
    biases: pd.DataFrame | None,
    nbins_grid: int = 500,
    res: int = 5000,
    n_bins: int = 100,
    passes: int = 1,
    outlier_q: float = 0.05,
    grid_points: int = 1000,
    n_chroms: int = 2,
    possible_override: pd.Series | None = None,
) -> pd.DataFrame:
    c = contacts.copy()
    c["dist"] = c["mid2"] - c["mid1"]
    if biases is not None:
        # biases are keyed (chr, mid): midpoints repeat across chromosomes
        b1 = biases.rename(
            columns={"chr": "chr1", "mid": "mid1", "bias": "bias1"}
        )
        b2 = biases.rename(
            columns={"chr": "chr2", "mid": "mid2", "bias": "bias2"}
        )
        c = c.merge(b1, on=["chr1", "mid1"], how="left").merge(
            b2, on=["chr2", "mid2"], how="left"
        )
        c["bias1"] = c["bias1"].fillna(1.0)
        c["bias2"] = c["bias2"].fillna(1.0)
    else:
        c["bias1"] = 1.0
        c["bias2"] = 1.0

    n_total = int(c["contact_count"].sum())
    if possible_override is not None:
        # caller-supplied census (e.g. fragment mode), already in range
        possible = possible_override.astype("int64")
    else:
        # possible pairs per lag, summed over n_chroms same-size grids
        ks = np.arange(1, nbins_grid)
        possible = pd.Series(
            n_chroms * (nbins_grid - ks), index=ks * res, dtype="int64"
        )
    m_possible = int(possible.sum())

    def fit_curve(fit_c: pd.DataFrame):
        byd = (
            fit_c.groupby("dist")
            .agg(cc=("contact_count", "sum"), np_=("contact_count", "size"))
            .sort_index()
        )
        byd["n_possible"] = possible.reindex(byd.index).fillna(byd["np_"]).astype("int64")
        total = int(byd["cc"].sum())
        target = total / n_bins
        cum = byd["cc"].cumsum()
        bin_id = np.minimum(
            np.floor((cum - byd["cc"]) / target).astype("int64"), n_bins - 1
        )
        g = byd.assign(bin_id=bin_id, dxcc=byd.index.values * byd["cc"])
        per_bin = g.groupby("bin_id").agg(
            sum_cc=("cc", "sum"),
            n_pairs=("np_", "sum"),
            n_possible=("n_possible", "sum"),
            dxcc=("dxcc", "sum"),
        )
        avg_dist = per_bin["dxcc"].astype("float64") / per_bin["sum_cc"]
        prob = (per_bin["sum_cc"] / per_bin["n_possible"].clip(lower=1)) / float(
            n_total
        )
        return st.fit_monotone_curve(
            avg_dist.to_numpy(),
            prob.to_numpy(),
            w=per_bin["n_pairs"].to_numpy(dtype=np.float64),
            grid_points=grid_points,
        )

    fit_c = c
    out = None
    for _ in range(max(1, passes)):
        gx, gy = fit_curve(fit_c)
        null = st.interp_clamped(c["dist"].to_numpy(dtype=np.float64), gx, gy)
        invalid = (
            (c["bias1"] < BIAS_LO)
            | (c["bias1"] > BIAS_HI)
            | (c["bias2"] < BIAS_LO)
            | (c["bias2"] > BIAS_HI)
        )
        bias_prod = np.where(invalid, 1.0, c["bias1"] * c["bias2"])
        prior = np.clip(null * bias_prod, 0.0, 1.0)
        p = st.binom_sf_ge(
            c["contact_count"].to_numpy(dtype=np.float64), float(n_total), prior
        )
        out = c.copy()
        out["p_value"] = p
        out = out.sort_values(
            ["p_value", "chr1", "mid1", "mid2"], kind="mergesort"
        ).reset_index(drop=True)
        rk = np.arange(1, len(out) + 1)
        q_raw = np.minimum(1.0, out["p_value"].to_numpy() * m_possible / rk)
        out["q_value"] = np.minimum.accumulate(q_raw[::-1])[::-1]
        sig = out[out["q_value"] < outlier_q][["chr1", "mid1", "chr2", "mid2"]]
        fit_c = c.merge(
            sig, on=["chr1", "mid1", "chr2", "mid2"], how="left", indicator=True
        )
        fit_c = fit_c[fit_c["_merge"] == "left_only"].drop(columns="_merge")
    return out[
        [
            "chr1",
            "mid1",
            "chr2",
            "mid2",
            "contact_count",
            "p_value",
            "q_value",
            "bias1",
            "bias2",
        ]
    ]
