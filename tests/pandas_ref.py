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


def run_significance_all_pandas(
    intra: pd.DataFrame,
    inter: pd.DataFrame,
    biases: pd.DataFrame | None,
    nbins_grid: int = 500,
    res: int = 5000,
    n_bins: int = 100,
    grid_points: int = 1000,
    n_chroms: int = 2,
) -> pd.DataFrame:
    """contact_type='All' reference: intra contacts scored against the
    fitted distance null, inter contacts against the flat interChrProb
    null [SC-5], ONE combined BH pass with
    M = possibleIntra + possibleInter.  Same independence contract as
    :func:`run_significance_pandas` — pandas dataflow, shared numeric
    kernels only."""

    def attach(c: pd.DataFrame) -> pd.DataFrame:
        c = c.copy()
        if biases is not None:
            b1 = biases.rename(columns={"chr": "chr1", "mid": "mid1", "bias": "bias1"})
            b2 = biases.rename(columns={"chr": "chr2", "mid": "mid2", "bias": "bias2"})
            c = c.merge(b1, on=["chr1", "mid1"], how="left").merge(
                b2, on=["chr2", "mid2"], how="left"
            )
            c["bias1"] = c["bias1"].fillna(1.0)
            c["bias2"] = c["bias2"].fillna(1.0)
        else:
            c["bias1"] = 1.0
            c["bias2"] = 1.0
        invalid = (
            (c["bias1"] < BIAS_LO)
            | (c["bias1"] > BIAS_HI)
            | (c["bias2"] < BIAS_LO)
            | (c["bias2"] > BIAS_HI)
        )
        c["bias_prod"] = np.where(invalid, 1.0, c["bias1"] * c["bias2"])
        return c

    intra = attach(intra)
    inter = attach(inter)
    intra["dist"] = intra["mid2"] - intra["mid1"]

    # --- intra: fitted distance null (same as run_significance_pandas) ---
    n_total = int(intra["contact_count"].sum())
    ks = np.arange(1, nbins_grid)
    possible = pd.Series(
        n_chroms * (nbins_grid - ks), index=ks * res, dtype="int64"
    )
    m_intra = int(possible.sum())
    byd = (
        intra.groupby("dist")
        .agg(cc=("contact_count", "sum"), np_=("contact_count", "size"))
        .sort_index()
    )
    byd["n_possible"] = (
        possible.reindex(byd.index).fillna(byd["np_"]).astype("int64")
    )
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
    gx, gy = st.fit_monotone_curve(
        avg_dist.to_numpy(),
        prob.to_numpy(),
        w=per_bin["n_pairs"].to_numpy(dtype=np.float64),
        grid_points=grid_points,
    )
    null = st.interp_clamped(intra["dist"].to_numpy(dtype=np.float64), gx, gy)
    prior_i = np.clip(null * intra["bias_prod"].to_numpy(), 0.0, 1.0)
    intra["p_value"] = st.binom_sf_ge(
        intra["contact_count"].to_numpy(dtype=np.float64), float(n_total), prior_i
    )

    # --- inter: flat interChrProb null [SC-5] ---
    nb = np.full(n_chroms, nbins_grid, dtype=np.int64)
    possible_inter = int((nb.sum() ** 2 - (nb**2).sum()) // 2)
    n_inter = int(inter["contact_count"].sum())
    inter_prob = n_inter / possible_inter if possible_inter else 0.0
    prior_x = np.clip(inter_prob * inter["bias_prod"].to_numpy(), 0.0, 1.0)
    inter["p_value"] = st.binom_sf_ge(
        inter["contact_count"].to_numpy(dtype=np.float64), float(n_inter), prior_x
    )

    # --- combined BH: M = possibleIntra + possibleInter ---
    cols = ["chr1", "mid1", "chr2", "mid2", "contact_count", "p_value", "bias1", "bias2"]
    out = pd.concat([intra[cols], inter[cols]], ignore_index=True)
    out = out.sort_values(
        ["p_value", "chr1", "chr2", "mid1", "mid2"], kind="mergesort"
    ).reset_index(drop=True)
    m_bh = m_intra + possible_inter
    rk = np.arange(1, len(out) + 1)
    q_raw = np.minimum(1.0, out["p_value"].to_numpy() * m_bh / rk)
    out["q_value"] = np.minimum.accumulate(q_raw[::-1])[::-1]
    return out[
        ["chr1", "mid1", "chr2", "mid2", "contact_count", "p_value", "q_value", "bias1", "bias2"]
    ]
