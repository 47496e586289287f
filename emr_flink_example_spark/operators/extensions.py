"""Tail-registered catalog additions (r13+).

Prefix discipline (VERDICT r9/r11): the driver re-checks the catalog's
FIRST 50 entries byte-for-byte, and the dedup/similarity modules occupy
that prefix — so a new query whose THEMATIC home is one of the head
modules cannot register in that module's QUERIES dict without shifting
the checked prefix. Implementations stay in their home module (where
the shared helpers and docs live); this module only registers them, and
it sits LAST in plans/catalog._MODULES so every entry lands at the
catalog tail.

Modules past the prefix (analytics, timeseries, ...) keep registering
additions at their own tails as before — only head-module additions
route through here.
"""

from __future__ import annotations

from .dedup import (
    _oph_calibration_oracle,
    _oph_oracle,
    q_dedup_minhash_oph,
    q_oph_calibration,
)

QUERIES = {
    "dedup_minhash_oph": q_dedup_minhash_oph,
    # r13 continuation: densified-estimator quality measurement
    "oph_calibration": q_oph_calibration,
}

ORACLES = {
    "dedup_minhash_oph": _oph_oracle(),
    "oph_calibration": _oph_calibration_oracle(),
}
