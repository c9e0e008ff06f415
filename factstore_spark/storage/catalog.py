"""Store catalog: named logical stores, fully isolated (StoreMetadata.kt:5-9,
isolation test AbstractFactStoreTest.kt:1422-1443).

A JSON file guarded by a root-level flock; the Spark-facing view is
exposed as a DataFrame by the engine (``FactStore.stores_df``)."""

from __future__ import annotations

import fcntl
import json
import os
import uuid
from contextlib import contextmanager
from datetime import datetime, timezone
from typing import Iterator, Optional

from ..model import StoreMetadata

CATALOG_FILE = "catalog.json"
CATALOG_LOCK = "_catalog.lock"


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # Reader memo keyed on the file's stat signature (round 15):
        # every append resolves its store through find_by_name, which
        # used to re-open and re-parse catalog.json per request. The
        # catalog only changes on create/remove (a whole-file rewrite,
        # which moves size/mtime_ns), so one stat(2) decides whether
        # the cached parse is still current — same memo pattern as the
        # commit log's incremental parse. Writers bypass the memo
        # (for_write reads stay strict and fresh under the flock).
        self._read_memo: Optional[tuple[tuple[int, int, int], dict]] = None

    def _path(self) -> str:
        return os.path.join(self.root, CATALOG_FILE)

    @contextmanager
    def _lock(self) -> Iterator[None]:
        fd = os.open(os.path.join(self.root, CATALOG_LOCK), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _read(self, for_write: bool = False) -> dict:
        """Read the catalog. Plain readers degrade an unreadable file to
        an empty view (a fresh root genuinely has no catalog yet), but
        WRITERS must not: create/remove read-modify-WRITE the whole
        file, so treating a transiently unreadable or corrupted catalog
        as empty would rewrite it with one entry and silently erase
        every existing store registration. A writer therefore raises on
        anything except clean absence."""
        if not for_write and self._read_memo is not None:
            try:
                st = os.stat(self._path())
                sig = (st.st_ino, st.st_size, st.st_mtime_ns)
                if sig == self._read_memo[0]:
                    return dict(self._read_memo[1])
            except OSError:
                pass
        try:
            with open(self._path()) as f:
                st = os.fstat(f.fileno())
                data = json.load(f)
                self._read_memo = (
                    (st.st_ino, st.st_size, st.st_mtime_ns),
                    dict(data),
                )
                return data
        except FileNotFoundError:
            return {}
        except (OSError, json.JSONDecodeError) as e:
            if for_write:
                raise RuntimeError(
                    f"catalog {self._path()} unreadable ({e!r}); refusing to "
                    "rewrite it from an empty view — that would erase every "
                    "registered store. Repair or remove the file explicitly."
                ) from e
            return {}

    def _write(self, data: dict) -> None:
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=0)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._path())

    @staticmethod
    def _meta(name: str, entry: dict) -> StoreMetadata:
        return StoreMetadata(
            id=entry["id"],
            name=name,
            created_at=datetime.fromisoformat(entry["created_at"]),
        )

    def create(self, name: str) -> Optional[StoreMetadata]:
        """None -> name already exists (CreateStoreResult.kt:3-8)."""
        with self._lock():
            data = self._read(for_write=True)
            if name in data:
                return None
            entry = {
                "id": str(uuid.uuid4()),
                "created_at": datetime.now(timezone.utc).isoformat(),
            }
            data[name] = entry
            self._write(data)
            return self._meta(name, entry)

    def list_all(self) -> list[StoreMetadata]:
        data = self._read()
        return sorted(
            (self._meta(n, e) for n, e in data.items()), key=lambda m: m.created_at
        )

    def find_by_name(self, name: str) -> Optional[StoreMetadata]:
        entry = self._read().get(name)
        return self._meta(name, entry) if entry else None

    def remove(self, name: str) -> Optional[StoreMetadata]:
        with self._lock():
            data = self._read(for_write=True)
            entry = data.pop(name, None)
            if entry is None:
                return None
            self._write(data)
            return self._meta(name, entry)
