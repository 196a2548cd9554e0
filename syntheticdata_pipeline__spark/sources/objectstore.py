"""K3/K4: object-store sink — the reference's S3 upload/resume loop
(AsyncImageGen/src/s3_uploader.py:16-79, test_kimono_ec2.py:289-342) as a
partition-parallel Spark sink.

Semantics preserved:
- keyed PUT, overwrite-by-key idempotent (`{prefix}/{id}/{id}.png` +
  sidecar `.txt`, s3_uploader.py:28-33): re-running an upload converges to
  the same store state — retries and speculative tasks are safe;
- per-item error isolation (upload_data's try/except): one failed PUT
  yields an 'error' row, never a failed job;
- resume scan (`get_existing_prompts`, s3_uploader.py:41-79): list keys
  under a prefix → extract ids → anti-join against pending work
  (composes with operators/state.py's resume machinery);
- the reference's ASYNC overlap (K4) is subsumed by partition parallelism:
  N partitions upload concurrently per executor fleet, no event loop.

The boto3 client is import-gated (not in this container); LocalFSStore
implements the same PUT/GET/LIST contract on a directory and backs the
tests. Swap the factory to go live — the kernel code is identical.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

try:  # pragma: no cover - boto3 not in this container
    import boto3  # noqa: F401

    _HAVE_BOTO3 = True
except Exception:
    _HAVE_BOTO3 = False


class ObjectStore(Protocol):
    def put(self, key: str, data: bytes) -> None: ...

    def get(self, key: str) -> bytes: ...

    def list_keys(self, prefix: str) -> list[str]: ...


class LocalFSStore:
    """Directory-backed object store with S3 key semantics ('/' in keys
    becomes directory structure; PUT overwrites atomically)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        # S3 keys are opaque strings — a '..' segment is literal key text
        # on S3, but on a filesystem it traverses OUT of the store root
        # (an uncontrolled scraped id in a key template would write
        # outside the store). The directory adapter cannot represent the
        # S3 behavior, so it rejects loudly instead of traversing.
        path = os.path.normpath(os.path.join(self.root, key.lstrip("/")))
        root = os.path.normpath(self.root)
        if path != root and not path.startswith(root + os.sep):
            raise ValueError(f"object key escapes the store root: {key!r}")
        return path

    def put(self, key: str, data: bytes) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".__tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic overwrite — idempotent by key

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def list_keys(self, prefix: str) -> list[str]:
        base = self._path(prefix)
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                full = os.path.join(dirpath, fn)
                out.append(os.path.relpath(full, self.root))
        return sorted(out)


if _HAVE_BOTO3:  # pragma: no cover - exercised only where boto3 exists

    class S3Store:
        """Real S3 client with the same contract (upload_fileobj/put_object
        per s3_uploader.py:28-33; list via paginator :50-79)."""

        def __init__(self, bucket: str, region: str | None = None):
            self._s3 = boto3.client("s3", region_name=region)
            self.bucket = bucket

        def put(self, key: str, data: bytes) -> None:
            self._s3.put_object(Bucket=self.bucket, Key=key, Body=data)

        def get(self, key: str) -> bytes:
            return self._s3.get_object(Bucket=self.bucket, Key=key)["Body"].read()

        def list_keys(self, prefix: str) -> list[str]:
            keys, paginator = [], self._s3.get_paginator("list_objects_v2")
            for page in paginator.paginate(Bucket=self.bucket, Prefix=prefix):
                keys.extend(o["Key"] for o in page.get("Contents", []))
            return sorted(keys)


# per-executor singleton stores (same pattern as sources/browser.py)
_STORES: dict[str, object] = {}


def _get_store(factory: Callable[[], object], key: str):
    if key not in _STORES:
        _STORES[key] = factory()
    return _STORES[key]


def upload_objects(
    df: DataFrame,
    store_factory: Callable[[], object],
    store_key: str,
    key_col: str = "key",
    payload_col: str = "payload",
) -> DataFrame:
    """Executor-side keyed PUT of every row → (key, n_bytes, upload_ok).

    Runs inside mapInPandas: payloads never visit the driver; partitions
    upload in parallel (the K4 overlap); a failed PUT poisons only its row.
    Overwrite-by-key makes retries/speculation idempotent."""
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n_bytes", LongType()),
            StructField("upload_ok", StringType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        store = _get_store(store_factory, store_key)
        for pdf in batches:
            keys, sizes, oks = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload or b"")
                try:
                    store.put(key, data)
                    oks.append("ok")
                except Exception:
                    oks.append("error")
                keys.append(key)
                sizes.append(len(data))
            yield pd.DataFrame({"key": keys, "n_bytes": sizes, "upload_ok": oks})

    return df.mapInPandas(kernel, schema=out_schema)


def existing_ids(spark, store: ObjectStore, prefix: str) -> DataFrame:
    """Resume scan (s3_uploader.py:41-79): list keys under prefix, extract
    the first path segment as the processed id — feed to an anti-join."""
    keys = store.list_keys(prefix)
    ids = set()
    for key in keys:
        rel = key[len(prefix):].lstrip("/") if key.startswith(prefix) else key
        head = rel.split("/", 1)[0]
        if head.isdigit():
            ids.add(int(head))
    return spark.createDataFrame(
        [(i,) for i in sorted(ids)], "done_id long"
    )
