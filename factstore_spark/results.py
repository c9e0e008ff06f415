"""Sealed result types — the zero-exception policy is part of the API
contract (factstore-specification/docs/design-documents/zero-exception-policy.md).

Each engine operation returns exactly one of the variants below; expected
outcomes (store missing, condition violated, already applied, not found)
are data, never exceptions. Mirrors the sealed interfaces in
``factstore-specification`` (e.g. AppendResult.kt:14-48, FindByIdResult.kt:3-7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Union

from .model import Fact, StoreMetadata


# --- store management (CreateStoreResult.kt:3-8, StoreRemover.kt:3-7) ------


@dataclass(frozen=True)
class StoreCreated:
    metadata: StoreMetadata


@dataclass(frozen=True)
class StoreNameAlreadyExists:
    name: str


CreateStoreResult = Union[StoreCreated, StoreNameAlreadyExists]


@dataclass(frozen=True)
class StoreRemoved:
    name: str


@dataclass(frozen=True)
class StoreNotFound:
    name: str


RemoveStoreResult = Union[StoreRemoved, StoreNotFound]


# --- append (AppendResult.kt:14-48) ----------------------------------------


@dataclass(frozen=True)
class Appended:
    """``fact_ids[i]`` corresponds to the i-th input fact; the whole batch
    shares one ``appended_at`` instant (AppendResult.kt:20-29)."""

    fact_ids: tuple[str, ...]
    appended_at: datetime
    positions: tuple[int, ...] = field(default=())


@dataclass(frozen=True)
class AlreadyApplied:
    idempotency_key: str


@dataclass(frozen=True)
class AppendConditionViolated:
    reason: str = ""


AppendResult = Union[Appended, AlreadyApplied, AppendConditionViolated, StoreNotFound]


# --- finders (FindByIdResult.kt:3-7, FactFinder.kt:13-56) ------------------


@dataclass(frozen=True)
class FactFound:
    fact: Fact


@dataclass(frozen=True)
class FactNotFound:
    fact_id: str


FindByIdResult = Union[FactFound, FactNotFound, StoreNotFound]


@dataclass(frozen=True)
class Exists:
    pass


@dataclass(frozen=True)
class DoesNotExist:
    pass


ExistsByIdResult = Union[Exists, DoesNotExist, StoreNotFound]


@dataclass(frozen=True)
class FactsFound:
    facts: tuple[Fact, ...]


FindResult = Union[FactsFound, StoreNotFound]


# --- streaming -------------------------------------------------------------


@dataclass(frozen=True)
class FactIdNotFound:
    """Unknown ``After(fact_id)`` cursor (FactSubscriber.kt:44-52)."""

    fact_id: str
