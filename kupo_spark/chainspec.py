"""Deterministic chain derivation spec.

The driver provides a synthetic ``events`` table (event_id, ts, user_id,
event_type, value, props).  We derive from it — with *engine-portable*
expressions (identical semantics in Spark SQL and DuckDB SQL: integer
arithmetic, md5, concat/substr) — a kupo-shaped chain:

  * one transaction per event, BLOCK_TXS transactions per block
    (slot_no = event_id DIV BLOCK_TXS),
  * one produced output per transaction, with a reshuffled-hex address
    (tag ‖ [delegation] ‖ header ‖ payment — reference encoding described at
    /root/reference/src/Kupo/Data/Database.hs:536-599), multi-asset value,
    optional datum / script, metadata tags,
  * a UTxO-valid spend graph: transaction e spends the output of
    transaction e - SPEND_LAG iff e % SPEND_MOD == 0 (injective, always
    backwards in time — the UTxO constraint of
    /root/reference/test/Test/Kupo/Data/UtxoConstraint.hs:32-88).

Every rule below exists twice: as a Spark SQL expression (chaingen.py) and as
a DuckDB CTE (oracle.py).  This module centralizes the constants plus Python
md5 helpers used to materialize literal pattern constants for test queries.
"""

from __future__ import annotations

import hashlib

# ---- derivation constants (change => change both chaingen and oracle) ----
BLOCK_TXS = 10          # transactions per block: slot_no = event_id DIV 10
SPEND_LAG = 17          # tx e spends output of tx (e - 17) ...
SPEND_MOD = 3           # ... iff e % 3 == 0 and e >= 17
PAY_KEYS = 97           # payment credential cardinality (user_id % 97)
DEL_KEYS = 53           # delegation credential cardinality (user_id % 53)
POLICY_KEYS = 7         # policy_id cardinality
ASSET_KEYS = 5          # asset_name cardinality
DATUM_KEYS = 211        # datum hash reuse modulus
SCRIPT_KEYS = 13        # script hash cardinality
SCRIPT_MOD = 6          # script present iff event_id % 6 == 0
META_MOD = 4            # metadata present iff event_id % 4 == 0
META_TAG = 674          # the well-known tag carried by every metadata tx
LONGEST_ROLLBACK = 360  # our scaled-down analog of kupo's k=129600 slots
                        # (/root/reference/src/Kupo/Options.hs:149)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def credential(prefix: str, key: int) -> str:
    """56-hex-char (28-byte) credential: md5(prefix‖key) ‖ md5(prefix2‖key)[:24]."""
    return md5_hex(f"{prefix}{key}") + md5_hex(f"{prefix}2{key}")[:24]


def payment_credential_of(user_id: int) -> str:
    return credential("pay", user_id % PAY_KEYS)


def delegation_credential_of(user_id: int) -> str:
    return credential("del", user_id % DEL_KEYS)


def address_of(user_id: int) -> str:
    """Reshuffled-hex address. tag ∈ {00 bootstrap, 01 base, 02 pointer,
    03 enterprise}; only tag 01 carries a delegation part (2+56+2+56 chars),
    the rest are 2+2+56 chars."""
    tag = user_id % 4
    header = f"0{user_id % 2}"
    pay = payment_credential_of(user_id)
    if tag == 1:
        return f"01{delegation_credential_of(user_id)}{header}{pay}"
    return f"{tag:02d}{header}{pay}"


def transaction_id_of(event_id: int) -> str:
    return md5_hex(f"tx{event_id}")


def output_reference_of(event_id: int, output_index: int = 0) -> str:
    return f"{transaction_id_of(event_id)}#{output_index}"


def policy_id_of(key: int) -> str:
    return md5_hex(f"pol{key % POLICY_KEYS}")


def asset_name_of(key: int) -> str:
    return md5_hex(f"ast{key % ASSET_KEYS}")


def datum_hash_of(event_id: int) -> str:
    return md5_hex(f"dat{event_id % DATUM_KEYS}")


def script_hash_of(event_id: int) -> str:
    return md5_hex(f"scr{event_id % SCRIPT_KEYS}")
