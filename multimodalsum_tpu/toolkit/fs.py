"""Filesystem accessors: a small abstraction over local / S3 storage.

Equivalent of the reference ``mltoolkit/mlutils/fs_accessors/
{local,s3}_fs_accessor.py`` + ``helpers/aws.py``: pipeline code addresses
files through an accessor so the same steps run against local disk or an
object store. The S3 backend is import-gated on ``boto3`` (this environment
has no egress); everything else is dependency-free.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
from typing import IO, Iterator, List


class FsAccessor:
    """Interface: open/list/exists/remove/makedirs over a storage backend."""

    def open(self, path: str, mode: str = "r", **kw) -> IO:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> List[str]:
        raise NotImplementedError

    def glob(self, pattern: str) -> List[str]:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def copy(self, src: str, dst: str) -> None:
        with self.open(src, "rb") as f_in, self.open(dst, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)


class LocalFsAccessor(FsAccessor):
    """Plain local filesystem (reference ``local_fs_accessor.py``)."""

    def open(self, path: str, mode: str = "r", **kw) -> IO:
        if any(m in mode for m in ("w", "a")):
            parent = os.path.dirname(path)
            if parent:
                os.makedirs(parent, exist_ok=True)
        return open(path, mode, **kw)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> List[str]:
        return sorted(os.listdir(path))

    def glob(self, pattern: str) -> List[str]:
        return sorted(_glob.glob(pattern))

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


class S3FsAccessor(FsAccessor):
    """S3-backed accessor (reference ``s3_fs_accessor.py``). Paths are
    ``bucket/key``-style relative to the configured bucket. Requires
    ``boto3``; constructing without it raises ImportError so local-only
    environments fail fast and explicitly."""

    def __init__(self, bucket: str, client=None):
        if client is None:
            try:
                import boto3  # type: ignore
            except ImportError as e:  # pragma: no cover - no egress here
                raise ImportError(
                    "S3FsAccessor requires boto3 (unavailable in offline "
                    "environments); pass a client explicitly for testing") from e
            client = boto3.client("s3")
        self.bucket = bucket
        self.client = client

    def open(self, path: str, mode: str = "r", **kw) -> IO:
        import io

        if "r" in mode:
            body = self.client.get_object(Bucket=self.bucket, Key=path)["Body"].read()
            return io.BytesIO(body) if "b" in mode else io.StringIO(body.decode())
        if "w" in mode:
            bucket, client = self.bucket, self.client

            class _Writer(io.BytesIO if "b" in mode else io.StringIO):  # type: ignore
                def close(_self):
                    if _self.closed:  # IOBase contract: close() is idempotent
                        return
                    data = _self.getvalue()
                    if isinstance(data, str):
                        data = data.encode()
                    client.put_object(Bucket=bucket, Key=path, Body=data)
                    super(type(_self), _self).close()

            return _Writer()
        raise ValueError(f"unsupported mode {mode!r}")

    def _list_keys(self, prefix: str) -> Iterator[str]:
        """All keys under ``prefix``, following pagination (a single
        ``list_objects_v2`` call silently truncates at 1000 keys)."""
        token = None
        while True:
            kw = dict(Bucket=self.bucket, Prefix=prefix)
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for o in resp.get("Contents", []):
                yield o["Key"]
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")
            if token is None:
                return

    def exists(self, path: str) -> bool:
        # head_object is a single request (vs enumerating the whole
        # "<path>*" prefix subtree just to stat one key); a bare prefix
        # match would also wrongly return True for siblings like
        # "<path>.tmp"
        try:
            self.client.head_object(Bucket=self.bucket, Key=path)
            return True
        except Exception as e:  # botocore ClientError (404/NoSuchKey)
            code = getattr(e, "response", {}).get(
                "ResponseMetadata", {}).get("HTTPStatusCode")
            if code in (403, 404) or e.__class__.__name__ in (
                    "ClientError", "NoSuchKey"):
                return False
            raise

    def listdir(self, path: str) -> List[str]:
        """Immediate children (basenames), matching LocalFsAccessor."""
        prefix = path.rstrip("/") + "/" if path else ""
        children = {
            k[len(prefix):].split("/", 1)[0]
            for k in self._list_keys(prefix)
            if k != prefix
        }
        return sorted(children)

    def glob(self, pattern: str) -> List[str]:
        """Like local glob: ``*`` and ``?`` do not cross ``/`` boundaries
        (fnmatch's ``*`` would)."""
        import re

        prefix = pattern.split("*")[0].split("?")[0]
        rx = re.compile(
            "".join("[^/]*" if c == "*" else "[^/]" if c == "?" else re.escape(c)
                    for c in pattern) + r"\Z")
        return sorted(k for k in self._list_keys(prefix) if rx.match(k))

    def makedirs(self, path: str) -> None:
        pass  # object stores have no directories

    def remove(self, path: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=path)


def get_accessor(path: str) -> FsAccessor:
    """``s3://bucket/...`` -> S3 accessor, anything else -> local."""
    if path.startswith("s3://"):
        bucket = path[5:].split("/", 1)[0]
        return S3FsAccessor(bucket)
    return LocalFsAccessor()
