"""Empirical protein models LG and WAG (20 states, PAML order).

Reference parity: phylo_utils/models.py LG/WAG classes with optional user
frequencies, i.e. "+F" (SURVEY.md §2 [HIGH]).
"""
from __future__ import annotations

import jax.numpy as jnp

from phylo_utils_tpu.data import LG_FREQS, LG_RATES, WAG_FREQS, WAG_RATES
from phylo_utils_tpu.models.base import Model


def _lg_build(freqs):
    freqs = jnp.asarray(freqs)
    return jnp.asarray(LG_RATES, freqs.dtype), freqs


def _wag_build(freqs):
    freqs = jnp.asarray(freqs)
    return jnp.asarray(WAG_RATES, freqs.dtype), freqs


LG = Model("LG", 20, "protein", {"freqs": tuple(LG_FREQS.tolist())}, _lg_build)
WAG = Model("WAG", 20, "protein", {"freqs": tuple(WAG_FREQS.tolist())}, _wag_build)


def empirical_model_from_dat(source: str, name: str | None = None) -> Model:
    """Build an empirical 20-state model from a PAML-format ``.dat`` file.

    Only LG and WAG ship in-repo (their constants are published and
    re-typed here); every other empirical matrix (JTT ``jones.dat``,
    ``dayhoff.dat``, ``mtREV24.dat``, ``cpREV.dat``, ``mtmam.dat``, ...)
    is distributed with PAML/PhyML as a ``.dat`` file this loader reads
    directly, so users are not limited to the bundled pair.

    ``source`` is a file path or the file's literal text. PAML layout:
    the 190 lower-triangle exchangeabilities ``S[i][j]`` (19 rows, row
    ``i`` holding ``i`` entries), then the 20 equilibrium frequencies —
    both in PAML state order A R N D C Q E G H I L K M F P S T W Y V
    (the package's protein alphabet order). Everything after the 210th
    number (citations, comments) is ignored; non-numeric tokens among
    the numbers (e.g. an amino-acid label row) are skipped.

    Reference parity: generalizes phylo_utils/models.py's fixed LG/WAG
    empirical-data classes (SURVEY.md §2) to any published matrix.
    """
    import os

    text = source
    if os.path.exists(source):
        if name is None:
            name = os.path.splitext(os.path.basename(source))[0]
        with open(source) as f:
            text = f.read()
    elif not text.strip() or (len(text.splitlines()) == 1
                              and text.strip().lower().endswith(".dat")):
        # a path-looking argument that doesn't exist: a clearer error
        # than "found 0 numbers"
        raise FileNotFoundError(f"no such .dat file: {source!r}")
    need = 20 * 19 // 2 + 20
    vals = []
    for tok in text.split():
        try:
            vals.append(float(tok))
        except ValueError:
            continue
        if len(vals) == need:
            break
    if len(vals) < need:
        raise ValueError(
            f"PAML .dat parse: found {len(vals)} numbers, need {need} "
            "(190 lower-triangle exchangeabilities + 20 frequencies)"
        )
    import numpy as np

    tri = np.asarray(vals[:190], dtype=np.float64)
    freqs = np.asarray(vals[190:need], dtype=np.float64)
    if np.any(tri < 0.0):
        raise ValueError("PAML .dat parse: negative exchangeability")
    if np.any(freqs <= 0.0):
        raise ValueError("PAML .dat parse: non-positive frequency")
    rates = np.zeros((20, 20), dtype=np.float64)
    k = 0
    for i in range(1, 20):
        rates[i, :i] = tri[k:k + i]
        rates[:i, i] = tri[k:k + i]
        k += i
    freqs = freqs / freqs.sum()

    def _build(freqs):
        freqs = jnp.asarray(freqs)
        return jnp.asarray(rates, freqs.dtype), freqs

    return Model(name or "custom_dat", 20, "protein",
                 {"freqs": tuple(freqs.tolist())}, _build)
