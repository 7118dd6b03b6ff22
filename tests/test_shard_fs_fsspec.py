"""FsspecShardFS adapter logic pinned against a MINIMAL in-test fsspec
mock (the real package is absent in this container — the adapter would
otherwise ship as dead code). The mock implements the exact fsspec
surface the adapter calls (filesystem(), ls, isdir, makedirs, exists,
rm_file, rm, cat_file, pipe_file, copy, info), backed by a dict, so
scheme aliasing, basename listing, recursive dir replace, error
normalization, and the S3 conditional-write (CAS) call shape are all
exercised — the mock models S3's documented conditional-PUT semantics
(ETag per object; ``IfNoneMatch='*'`` rejects overwrites,
``IfMatch=<etag>`` rejects mismatches with a 412-style error)."""

import sys
import types

import pytest


class _MockFS:
    def __init__(self):
        self.objs: dict[str, bytes] = {}
        self.dirs: set[str] = set()

    # --- fsspec surface the adapter uses -----------------------------
    def ls(self, path, detail=False):
        path = path.rstrip("/")
        out = set()
        for k in list(self.objs) + list(self.dirs):
            if k.startswith(path + "/"):
                rest = k[len(path) + 1 :]
                out.add(path + "/" + rest.split("/")[0])
        return sorted(out)

    def isdir(self, path):
        path = path.rstrip("/")
        return path in self.dirs or any(
            k.startswith(path + "/") for k in self.objs
        )

    def makedirs(self, path, exist_ok=False):
        self.dirs.add(path.rstrip("/"))

    def exists(self, path):
        return path in self.objs or self.isdir(path)

    def rm_file(self, path):
        if path not in self.objs:
            raise FileNotFoundError(path)
        del self.objs[path]

    def rm(self, path, recursive=False):
        path = path.rstrip("/")
        hit = False
        for k in list(self.objs):
            if k == path or (recursive and k.startswith(path + "/")):
                del self.objs[k]
                hit = True
        self.dirs.discard(path)
        if not hit and path not in self.dirs:
            raise FileNotFoundError(path)

    def cat_file(self, path):
        if path not in self.objs:
            raise FileNotFoundError(path)
        return self.objs[path]

    @staticmethod
    def _etag(data: bytes) -> str:
        import hashlib

        return hashlib.md5(data).hexdigest()

    def info(self, path):
        if path not in self.objs:
            raise FileNotFoundError(path)
        return {
            "name": path,
            "size": len(self.objs[path]),
            "ETag": f'"{self._etag(self.objs[path])}"',
        }

    def pipe_file(self, path, data, **kwargs):
        # model S3 conditional writes: these raise BEFORE mutating
        if "IfNoneMatch" in kwargs and path in self.objs:
            raise OSError(
                "An error occurred (PreconditionFailed) when calling "
                "the PutObject operation: At least one of the "
                "pre-conditions you specified did not hold"
            )
        if "IfMatch" in kwargs:
            want = str(kwargs["IfMatch"]).strip('"')
            cur = self.objs.get(path)
            if cur is None or self._etag(cur) != want:
                raise OSError(
                    "An error occurred (PreconditionFailed) when "
                    "calling the PutObject operation: 412"
                )
        self.objs[path] = bytes(data)

    def copy(self, src, dst, recursive=False):
        s, d = src.rstrip("/"), dst.rstrip("/")
        if recursive:
            for k in list(self.objs):
                if k.startswith(s + "/"):
                    self.objs[d + k[len(s):]] = self.objs[k]
        else:
            self.objs[d] = self.objs[s]


@pytest.fixture()
def mock_fsspec(monkeypatch):
    store = _MockFS()
    mod = types.ModuleType("fsspec")
    seen = []

    def filesystem(proto):
        seen.append(proto)
        return store

    mod.filesystem = filesystem
    monkeypatch.setitem(sys.modules, "fsspec", mod)
    return store, seen


def test_fsspec_adapter_surface(mock_fsspec):
    from dataprocessingframework_spark.sources.shard_fs import (
        FsspecShardFS,
        get_fs,
        join,
    )

    store, seen = mock_fsspec
    fs = get_fs("s3a://bucket/data")
    assert isinstance(fs, FsspecShardFS)
    assert seen == ["s3"]  # hadoop s3a spelling -> fsspec s3
    assert fs.atomic_rename is False

    root = "s3a://bucket/data"
    fs.makedirs(root)
    fs.put_atomic(join(root, "0.csv"), b"id\n1\n")
    fs.put_atomic(join(root, "sub/0.tar"), b"TAR")
    assert fs.exists(join(root, "0.csv"))
    assert fs.read_bytes(join(root, "0.csv")) == b"id\n1\n"
    # listdir returns BASENAMES (fsspec ls returns full keys)
    assert sorted(fs.listdir(root)) == ["0.csv", "sub"]
    assert fs.isdir(join(root, "sub"))
    assert not fs.isdir(join(root, "0.csv"))
    buf = fs.open_read(join(root, "0.csv"))
    assert buf.read() == b"id\n1\n" and buf.seekable()

    # open_write publishes ONE atomic PUT on close
    with fs.open_write(join(root, "1.csv")) as h:
        h.write(b"id\n")
        h.write(b"2\n")
        assert not fs.exists(join(root, "1.csv"))
    assert fs.read_bytes(join(root, "1.csv")) == b"id\n2\n"

    # file replace = copy + delete
    fs.replace(join(root, "1.csv"), join(root, "2.csv"))
    assert not fs.exists(join(root, "1.csv"))
    assert fs.read_bytes(join(root, "2.csv")) == b"id\n2\n"

    # dir replace = recursive copy + recursive delete (the dir-layout
    # shard publish)
    fs.put_atomic(join(root, "sub/a.bin"), b"A")
    fs.replace(join(root, "sub"), join(root, "3"))
    assert not fs.exists(join(root, "sub/0.tar"))
    assert fs.read_bytes(join(root, "3/0.tar")) == b"TAR"
    assert fs.read_bytes(join(root, "3/a.bin")) == b"A"

    # remove: FileNotFoundError surfaces (heal paths rely on it)
    with pytest.raises(FileNotFoundError):
        fs.remove(join(root, "nope.csv"))
    fs.remove(join(root, "2.csv"))
    fs.rmtree(join(root, "3"))
    assert not fs.exists(join(root, "3/0.tar"))
    fs.rmtree(join(root, "3"))  # idempotent


def test_fsspec_cas_call_shape(mock_fsspec):
    """The S3 conditional-write spelling: put_cas(None) maps to
    IfNoneMatch='*', put_cas(tag) to IfMatch='<etag>'; a 412-style
    precondition failure maps to False, not an exception; non-s3
    schemes report supports_cas False (no conditional-write story)."""
    from dataprocessingframework_spark.sources.shard_fs import (
        get_fs,
        join,
    )

    store, _ = mock_fsspec
    root = "s3://bucket/data"
    fs = get_fs(root)
    assert fs.supports_cas is True
    assert fs.supports_cas_delete is False
    lock = join(root, "_writer.lock")

    assert fs.get_cas(lock) is None
    assert fs.put_cas(lock, b"lease-A", None) is True
    # create-exclusive on an existing object: precondition fails
    assert fs.put_cas(lock, b"lease-B", None) is False
    assert fs.read_bytes(lock) == b"lease-A"

    data, tag = fs.get_cas(lock)
    assert data == b"lease-A"
    assert fs.put_cas(lock, b"lease-A2", tag) is True
    # the old tag no longer matches: refresh/takeover race loses
    assert fs.put_cas(lock, b"lease-A3", tag) is False
    assert fs.read_bytes(lock) == b"lease-A2"

    # gs has no conditional-write spelling wired: loud capability no
    assert get_fs("gs://b/x").supports_cas is False


def test_fsspec_adapter_error_normalization(mock_fsspec):
    """Driver exceptions that merely SAY not-found normalize to
    FileNotFoundError (fsspec drivers vary)."""
    from dataprocessingframework_spark.sources.shard_fs import get_fs

    store, _ = mock_fsspec

    def weird_rm_file(path):
        raise RuntimeError(f"key not found: {path}")

    store.rm_file = weird_rm_file
    fs = get_fs("gs://b/x")
    with pytest.raises(FileNotFoundError):
        fs.remove("gs://b/x/gone")


def test_fsspec_missing_is_a_loud_import_error(monkeypatch):
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "fsspec", None)
    from dataprocessingframework_spark.sources.shard_fs import get_fs

    with pytest.raises(ImportError, match="fsspec"):
        get_fs("s3://bucket/x")
