"""Order-insensitive DataFrame equivalence — the local twin of the
driver's row-count + schema + value-hash gate (strict by default: exact
values, so float outputs must follow registry.py's determinism rules)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize null/NaN, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.where(pd.notnull(s), None)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    sort_key = df.astype(str)
    order = sort_key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def assert_equivalent(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{key}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(oc):
            sa, oa = sc.to_numpy(), oc.to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                raise AssertionError(
                    f"{key}.{c}: {bad} float mismatches; first at row {idx}: "
                    f"spark={sa[idx]!r} oracle={oa[idx]!r} "
                    f"(maxdiff={np.nanmax(np.abs(sa - oa))})"
                )
        else:
            if not sc.equals(oc):
                neq = sc[sc.ne(oc) & ~(sc.isna() & oc.isna())]
                raise AssertionError(
                    f"{key}.{c}: value mismatch, first rows:\n"
                    f"spark:\n{sc[neq.index[:5]] if len(neq) else sc.head()}\n"
                    f"oracle:\n{oc[neq.index[:5]] if len(neq) else oc.head()}"
                )
