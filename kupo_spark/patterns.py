"""The Pattern language — kupo's declarative predicate over outputs.

Reference: 10-variant ADT at ``src/Kupo/Data/Pattern.hs:115-138``; text codec
``patternFromText``/``patternToText`` at ``Pattern.hs:227-381``; matching
semantics at ``Pattern.hs:383-415``; SQL compilation (the pushdown analog) at
``src/Kupo/Data/Database.hs:712-765``; subsumption algebra ``overlaps`` /
``includes`` at ``Pattern.hs:143-221``.

Here a pattern compiles to a Spark ``Column`` boolean expression, so Catalyst
pushes it into the parquet scan (predicate pushdown + min/max skipping) — the
Spark-native equivalent of kupo's hand-built index-oriented WHERE clauses.
A parallel ``to_sql`` compiler emits the equivalent ANSI-SQL predicate for
the DuckDB oracle.

Addresses are the reshuffled hex encoding (tag ‖ [delegation 28B] ‖ header ‖
payment 28B — ``Database.hs:536-599``) which makes every credential query a
prefix/suffix scan:

  * payment credential  == last 56 hex chars,
  * delegation credential == a '01'-prefixed LIKE scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = re.compile(r"^[0-9a-f]+$")
_CRED_LEN = 56  # 28-byte credential, hex
_TXID_LEN = 32  # md5-derived synthetic txid, hex (real Cardano: 64)


class PatternError(ValueError):
    pass


@dataclass(frozen=True)
class Pattern:
    def to_text(self) -> str:  # pragma: no cover - overridden
        raise NotImplementedError


@dataclass(frozen=True)
class MatchAny(Pattern):
    """`*` (including bootstrap) or `*/*` (only Shelley-style addresses)."""

    include_bootstrap: bool = True

    def to_text(self) -> str:
        return "*" if self.include_bootstrap else "*/*"


@dataclass(frozen=True)
class MatchExact(Pattern):
    address: str

    def to_text(self) -> str:
        return self.address


@dataclass(frozen=True)
class MatchPayment(Pattern):
    credential: str

    def to_text(self) -> str:
        return f"{self.credential}/*"


@dataclass(frozen=True)
class MatchDelegation(Pattern):
    credential: str

    def to_text(self) -> str:
        return f"*/{self.credential}"


@dataclass(frozen=True)
class MatchPaymentAndDelegation(Pattern):
    payment: str
    delegation: str

    def to_text(self) -> str:
        return f"{self.payment}/{self.delegation}"


@dataclass(frozen=True)
class MatchTransactionId(Pattern):
    transaction_id: str

    def to_text(self) -> str:
        return f"*@{self.transaction_id}"


@dataclass(frozen=True)
class MatchOutputReference(Pattern):
    transaction_id: str
    output_index: int

    def to_text(self) -> str:
        return f"{self.output_index}@{self.transaction_id}"


@dataclass(frozen=True)
class MatchPolicyId(Pattern):
    policy_id: str

    def to_text(self) -> str:
        return f"{self.policy_id}.*"


@dataclass(frozen=True)
class MatchAssetId(Pattern):
    policy_id: str
    asset_name: str

    def to_text(self) -> str:
        return f"{self.policy_id}.{self.asset_name}"


@dataclass(frozen=True)
class MatchMetadataTag(Pattern):
    """`{tag}` — indexing-time only; rejected on the query path
    (reference ``Database.hs:762-763``)."""

    tag: int

    def to_text(self) -> str:
        return "{%d}" % self.tag


def _hex_or_raise(s: str, what: str, length: int | None = None) -> str:
    if not _HEX.match(s):
        raise PatternError(f"invalid {what}: {s!r} is not lowercase hex")
    if length is not None and len(s) != length:
        # reference's transactionIdFromText / credential parsers reject
        # wrong-length digests (Pattern.hs:265-381)
        raise PatternError(
            f"invalid {what}: {s!r} has {len(s)} hex chars, expected {length}"
        )
    return s


def _credential(s: str, what: str) -> str:
    """A credential given as hex, or as a bech32 verification key /
    key-hash / script hash (P12: keys are blake2b-224-hashed,
    Pattern.hs:265-381)."""
    if _HEX.match(s):
        return _hex_or_raise(s, what, _CRED_LEN)
    from kupo_spark.codecs import credential_from_bech32

    cred = credential_from_bech32(s)
    if cred is None:
        raise PatternError(f"invalid {what}: {s!r} is neither hex nor bech32")
    return cred


def pattern_from_text(text: str) -> Pattern:
    """Parse the kupo text syntax (``patternFromText``, Pattern.hs:252-381).

    Synthetic-chain flavor: credentials/hashes are md5-hex; the bech32 /
    base58 / blake2b-of-verification-key entry points of the reference are
    address-codec concerns handled upstream of this engine.
    """
    text = text.strip()
    if not text:
        raise PatternError("empty pattern")
    m = re.match(r"^\{(\d+)\}$", text)
    if m:
        return MatchMetadataTag(int(m.group(1)))
    if "@" in text:
        left, right = text.split("@", 1)
        _hex_or_raise(right, "transaction id", _TXID_LEN)
        if left == "*":
            return MatchTransactionId(right)
        if not left.isdigit():
            raise PatternError(f"invalid output index {left!r}")
        return MatchOutputReference(right, int(left))
    if "." in text:
        left, right = text.split(".", 1)
        _hex_or_raise(left, "policy id")
        if right == "*":
            return MatchPolicyId(left)
        return MatchAssetId(left, _hex_or_raise(right, "asset name"))
    if "/" in text:
        left, right = text.split("/", 1)
        if left == "*" and right == "*":
            return MatchAny(include_bootstrap=False)
        if left == "*":
            return MatchDelegation(_credential(right, "delegation credential"))
        if right == "*":
            return MatchPayment(_credential(left, "payment credential"))
        return MatchPaymentAndDelegation(
            _credential(left, "payment credential"),
            _credential(right, "delegation credential"),
        )
    if text == "*":
        return MatchAny(include_bootstrap=True)
    if not _HEX.match(text):
        # bech32 entry points (Pattern.hs:252-381): full addresses and
        # reward accounts
        from kupo_spark.codecs import address_from_bech32, bech32_decode

        dec = bech32_decode(text)
        if dec is not None:
            hrp = dec[0]
            converted = address_from_bech32(text)
            if converted is not None:
                if hrp in ("stake", "stake_test"):
                    return MatchDelegation(converted)
                return MatchExact(converted)
        raise PatternError(f"invalid pattern {text!r}")
    return MatchExact(_hex_or_raise(text, "address"))


def pattern_to_text(p: Pattern) -> str:
    return p.to_text()


# ---------------------------------------------------------------------------
# Compilation to Spark Column predicates (Database.hs:712-765 analog).
# The frame must expose: address, transaction_id, output_index, assets,
# and (for MatchMetadataTag at ingest) metadata_tags.
# ---------------------------------------------------------------------------


def to_column(p: Pattern, *, at_ingest: bool = False) -> Column:
    a = F.col("address")
    if isinstance(p, MatchAny):
        if p.include_bootstrap:
            return F.lit(True)
        return ~a.startswith("00")
    if isinstance(p, MatchExact):
        return a == F.lit(p.address)
    if isinstance(p, MatchPayment):
        # suffix equality == generated payment_credential column equality
        return F.expr("right(address, 56)") == F.lit(p.credential)
    if isinstance(p, MatchDelegation):
        # prefix scan thanks to the reshuffled encoding (Database.hs:733-736)
        return a.startswith("01" + p.credential)
    if isinstance(p, MatchPaymentAndDelegation):
        return a.startswith("01" + p.delegation) & (
            F.expr("right(address, 56)") == F.lit(p.payment)
        )
    if isinstance(p, MatchTransactionId):
        # the reference's BETWEEN byte-interval scan over the packed
        # 34-byte reference (Database.hs:745-755): binary comparison in
        # Spark is unsigned-lexicographic, so [txid‖0000, txid‖ffff] covers
        # exactly this transaction's outputs, and the bounds push down to
        # the parquet scan's min/max stats.
        from kupo_spark.codecs import pack_output_reference

        lo = pack_output_reference(p.transaction_id, 0)
        hi = pack_output_reference(p.transaction_id, 0xFFFF)
        # the typed transaction_id conjunct is redundant with the byte
        # interval but load-bearing for storage skipping: Spark's in-memory
        # columnar cache keeps no min/max for BinaryType, so only the
        # string column's batch stats can prune a txid-clustered hot view
        return (
            F.col("output_reference_bin").between(F.lit(lo), F.lit(hi))
            & (F.col("transaction_id") == F.lit(p.transaction_id))
        )
    if isinstance(p, MatchOutputReference):
        # point equality on the packed reference (Database.hs:741-744);
        # typed conjuncts for batch-stats skipping as above
        from kupo_spark.codecs import pack_output_reference

        return (
            (
                F.col("output_reference_bin")
                == F.lit(pack_output_reference(p.transaction_id, p.output_index))
            )
            & (F.col("transaction_id") == F.lit(p.transaction_id))
            & (F.col("output_index") == F.lit(p.output_index))
        )
    if isinstance(p, MatchPolicyId):
        return F.map_contains_key(F.col("assets"), F.lit(p.policy_id))
    if isinstance(p, MatchAssetId):
        # fully pushed to the asset level: kupo pushes only to policy level
        # and re-filters rows post-scan (Database.hs:760-761,
        # Http.hs:656-670); semantics identical, plan better.
        return F.expr(
            f"try_element_at(try_element_at(assets, '{p.policy_id}'), '{p.asset_name}') IS NOT NULL"
        )
    if isinstance(p, MatchMetadataTag):
        if not at_ingest:
            raise PatternError(
                "{tag} patterns are indexing-only (Database.hs:762-763)"
            )
        return F.array_contains(F.col("metadata_tags"), F.lit(p.tag))
    raise PatternError(f"unknown pattern {p!r}")


def any_to_column(patterns, *, at_ingest: bool = False) -> Column:
    """OR-fold of a pattern set — kupo indexes the union of all configured
    patterns' matches (Pattern.hs:555-560)."""
    cols = [to_column(p, at_ingest=at_ingest) for p in patterns]
    acc = cols[0]
    for c in cols[1:]:
        acc = acc | c
    return acc


# ---------------------------------------------------------------------------
# SQL predicate compiler for the DuckDB oracle (same semantics, over the
# oracle's `inputs`/`assets_tbl` CTEs).
# ---------------------------------------------------------------------------


def to_sql(p: Pattern, alias: str = "i") -> str:
    a = f"{alias}.address"
    if isinstance(p, MatchAny):
        return "TRUE" if p.include_bootstrap else f"{a} NOT LIKE '00%'"
    if isinstance(p, MatchExact):
        return f"{a} = '{p.address}'"
    if isinstance(p, MatchPayment):
        return f"right({a}, 56) = '{p.credential}'"
    if isinstance(p, MatchDelegation):
        return f"{a} LIKE '01{p.credential}%'"
    if isinstance(p, MatchPaymentAndDelegation):
        return f"({a} LIKE '01{p.delegation}%' AND right({a}, 56) = '{p.payment}')"
    if isinstance(p, MatchTransactionId):
        return f"{alias}.transaction_id = '{p.transaction_id}'"
    if isinstance(p, MatchOutputReference):
        return (
            f"({alias}.transaction_id = '{p.transaction_id}' "
            f"AND {alias}.output_index = {p.output_index})"
        )
    if isinstance(p, MatchPolicyId):
        return (
            f"EXISTS (SELECT 1 FROM assets_tbl x WHERE "
            f"x.output_reference = {alias}.output_reference AND x.policy_id = '{p.policy_id}')"
        )
    if isinstance(p, MatchAssetId):
        return (
            f"EXISTS (SELECT 1 FROM assets_tbl x WHERE "
            f"x.output_reference = {alias}.output_reference AND x.policy_id = '{p.policy_id}' "
            f"AND x.asset_name = '{p.asset_name}')"
        )
    raise PatternError(f"pattern {p!r} has no query-time SQL form")


# ---------------------------------------------------------------------------
# Pattern algebra — overlaps / includes, mirroring the reference's case
# tables exactly (Pattern.hs:143-221 via matchingAddress, Pattern.hs:398-417).
# These feed the DELETE /matches guard and GET /patterns/{p}, so behavioral
# drift changes endpoint behavior.
# ---------------------------------------------------------------------------


def _payment_part(addr: str) -> str | None:
    """getPaymentPartBytes (Address.hs:56-61): bootstrap (tag 00) addresses
    have no payment part; every Shelley-style address ends in the 56-hex
    payment credential under the reshuffled encoding."""
    return None if addr.startswith("00") else addr[-56:]


def _delegation_part(addr: str) -> str | None:
    """getDelegationPartBytes (Address.hs:63-70): only tag-01 base addresses
    carry a delegation part."""
    return addr[2:58] if addr.startswith("01") else None


def matching_address(p: Pattern, addr: str) -> bool:
    """matchingAddress (Pattern.hs:398-417): does the *address-shaped* part
    of pattern p match this concrete address?  Non-address patterns never
    match (the reference's `_nonAddressPattern -> const False`)."""
    if isinstance(p, MatchAny):
        return p.include_bootstrap or not addr.startswith("00")
    if isinstance(p, MatchExact):
        return p.address == addr
    if isinstance(p, MatchPayment):
        return _payment_part(addr) == p.credential
    if isinstance(p, MatchDelegation):
        return _delegation_part(addr) == p.credential
    if isinstance(p, MatchPaymentAndDelegation):
        return (
            _payment_part(addr) == p.payment
            and _delegation_part(addr) == p.delegation
        )
    return False


def includes(p: Pattern, q: Pattern) -> bool:
    """True iff every output matched by q is matched by p
    (Pattern.hs:179-221, mirrored case-for-case)."""
    if isinstance(q, MatchExact):
        # (p, MatchExact addr) -> p `matchingAddress` addr — FIRST case,
        # takes precedence over everything below.
        return matching_address(p, q.address)
    if isinstance(p, MatchAny):
        if p.include_bootstrap:
            return True
        # MatchAny OnlyShelley includes everything except `*`
        # (reference: y /= MatchAny IncludingBootstrap)
        return q != MatchAny(include_bootstrap=True)
    if isinstance(p, MatchPayment):
        if isinstance(q, MatchPayment):
            return p.credential == q.credential
        if isinstance(q, MatchPaymentAndDelegation):
            return p.credential == q.payment
        return False
    if isinstance(p, MatchDelegation):
        if isinstance(q, MatchDelegation):
            return p.credential == q.credential
        if isinstance(q, MatchPaymentAndDelegation):
            return p.credential == q.delegation
        return False
    if isinstance(p, MatchPaymentAndDelegation):
        return (
            isinstance(q, MatchPaymentAndDelegation)
            and p.payment == q.payment
            and p.delegation == q.delegation
        )
    if isinstance(p, MatchOutputReference):
        if isinstance(q, MatchOutputReference):
            return (p.transaction_id, p.output_index) == (q.transaction_id, q.output_index)
        # reference: (MatchOutputReference a, MatchTransactionId a') ->
        #   getTransactionId a == a'  (and NOT the converse)
        if isinstance(q, MatchTransactionId):
            return p.transaction_id == q.transaction_id
        return False
    if isinstance(p, MatchTransactionId):
        return isinstance(q, MatchTransactionId) and p.transaction_id == q.transaction_id
    if isinstance(p, MatchPolicyId):
        if isinstance(q, (MatchPolicyId, MatchAssetId)):
            return p.policy_id == q.policy_id
        return False
    if isinstance(p, MatchAssetId):
        return isinstance(q, MatchAssetId) and (p.policy_id, p.asset_name) == (
            q.policy_id,
            q.asset_name,
        )
    if isinstance(p, MatchMetadataTag):
        return isinstance(q, MatchMetadataTag) and p.tag == q.tag
    return False


def included(p: Pattern, patterns) -> list[Pattern]:
    """All active patterns that fully include p (Pattern.hs `included`)."""
    return [q for q in patterns if includes(q, p)]


def _overlap_two(p: Pattern, q: Pattern) -> bool:
    """overlapTwo, one direction (Pattern.hs:147-177)."""
    if isinstance(p, MatchAny):
        return True
    if isinstance(p, MatchExact):
        return matching_address(q, p.address)
    if isinstance(p, MatchPayment):
        if isinstance(q, MatchPayment):
            return p.credential == q.credential
        if isinstance(q, MatchPaymentAndDelegation):
            return p.credential == q.payment
        return False
    if isinstance(p, MatchDelegation):
        if isinstance(q, MatchDelegation):
            return p.credential == q.credential
        if isinstance(q, MatchPaymentAndDelegation):
            return p.credential == q.delegation
        return False
    if isinstance(p, MatchPaymentAndDelegation):
        # pairs sharing EITHER credential overlap (a==a' || b==b')
        return isinstance(q, MatchPaymentAndDelegation) and (
            p.payment == q.payment or p.delegation == q.delegation
        )
    if isinstance(p, MatchOutputReference):
        if isinstance(q, MatchOutputReference):
            return (p.transaction_id, p.output_index) == (q.transaction_id, q.output_index)
        if isinstance(q, MatchTransactionId):
            return p.transaction_id == q.transaction_id
        return False
    if isinstance(p, MatchTransactionId):
        return isinstance(q, MatchTransactionId) and p.transaction_id == q.transaction_id
    if isinstance(p, MatchPolicyId):
        if isinstance(q, (MatchPolicyId, MatchAssetId)):
            return p.policy_id == q.policy_id
        return False
    if isinstance(p, MatchAssetId):
        return isinstance(q, MatchAssetId) and (p.policy_id, p.asset_name) == (
            q.policy_id,
            q.asset_name,
        )
    if isinstance(p, MatchMetadataTag):
        return isinstance(q, MatchMetadataTag) and p.tag == q.tag
    return False


def overlaps(p: Pattern, q: Pattern) -> bool:
    """Symmetric closure of overlapTwo — the reference's set-fold checks
    both directions for each pair (Pattern.hs:144-146)."""
    return _overlap_two(p, q) or _overlap_two(q, p)
