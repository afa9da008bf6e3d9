"""G23H catalog ingestion (Arrow/feather + DR2-transit sidecar).

Host-side equivalent of the reference's catalog loading and merging
(`/root/reference/src/likelihoods/g23h.jl:146-241`): the production
G23H catalog ships as a large Arrow/feather table keyed by `gaia_id` /
`hip_id`, with the Gaia DR2 matched-transit counts in a separate
sidecar table. This module selects one source's row, merges the
sidecar, and returns the plain dict `G23HObs(catalog=...)` consumes.

Zero-egress environments point `catalog` at a local file (the reference
keeps the same local-path escape hatch, `g23h.jl:13-14`).
"""

from __future__ import annotations

import numpy as np


def _load_table(path_or_table) -> dict:
    """Feather/Arrow/CSV path or mapping -> dict of numpy columns."""
    if isinstance(path_or_table, dict):
        return {k: np.asarray(v) for k, v in path_or_table.items()}
    path = str(path_or_table)
    if path.endswith((".feather", ".arrow", ".ipc")):
        import pyarrow.feather as feather

        tbl = feather.read_table(path)
        return {
            name: tbl.column(name).to_numpy(zero_copy_only=False)
            for name in tbl.column_names
        }
    if path.endswith(".csv"):
        import pandas as pd

        df = pd.read_csv(path)
        return {c: df[c].to_numpy() for c in df.columns}
    raise ValueError(
        f"unsupported catalog format {path!r} (feather/arrow/ipc/csv)"
    )


def _find_row(table: dict, gaia_id=None, hip_id=None) -> int:
    if gaia_id is not None and "gaia_id" in table:
        hits = np.nonzero(np.asarray(table["gaia_id"]) == gaia_id)[0]
        if len(hits):
            return int(hits[0])
    if hip_id is not None and "hip_id" in table:
        col = np.asarray(table["hip_id"])
        hits = np.nonzero(col == hip_id)[0]
        if len(hits):
            return int(hits[0])
    raise KeyError(
        f"source gaia_id={gaia_id} hip_id={hip_id} not found in catalog"
    )


def load_g23h_catalog_row(
    catalog,
    *,
    gaia_id=None,
    hip_id=None,
    dr2_transits_catalog=None,
) -> dict:
    """Select one source's G23H catalog row (+ DR2-transit sidecar).

    catalog: path to the G23H feather/arrow/csv catalog or an in-memory
    column mapping. dr2_transits_catalog: optional sidecar with
    `gaia_id` + `astrometric_matched_observations_dr2`
    (`g23h.jl:200-220` requires it for the DR2 epoch-selection model).
    Returns a plain dict of scalars, with missing/masked values dropped
    so `catalog.get(...)` fallbacks engage downstream.
    """
    table = _load_table(catalog)
    i = _find_row(table, gaia_id=gaia_id, hip_id=hip_id)
    row = {}
    for k, col in table.items():
        v = np.asarray(col)[i]
        # drop masked/NaN entries so downstream feature detection
        # (has_hip, has_rv, central-position covariance) works
        if v is None:
            continue
        if isinstance(v, (bytes, str)):
            row[k] = v.decode() if isinstance(v, bytes) else v
            continue
        fv = float(v)
        if np.isnan(fv):
            continue
        row[k] = fv
    if gaia_id is not None:
        row.setdefault("gaia_id", gaia_id)

    if dr2_transits_catalog is not None:
        sidecar = _load_table(dr2_transits_catalog)
        try:
            j = _find_row(sidecar, gaia_id=row.get("gaia_id", gaia_id))
            n = sidecar.get("astrometric_matched_observations_dr2")
            if n is not None and np.isfinite(float(np.asarray(n)[j])):
                row["astrometric_matched_observations_dr2"] = float(
                    np.asarray(n)[j]
                )
        except KeyError:
            pass  # no sidecar entry: downstream approximation engages
    return row
