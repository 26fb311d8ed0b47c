"""Optional fsspec bridge for the filesystem seam.

Maps :class:`sparkcodec.fs.FileSystem` onto any fsspec
``AbstractFileSystem`` (s3fs, gcsfs, adlfs, ...), so a real object-store
deployment is one call:

    from sparkcodec.fsspec_adapter import register_fsspec
    register_fsspec("s3")          # then encode_table(..., "s3://bucket/tbl")

fsspec is NOT a dependency of this package — the import is deferred to
:func:`register_fsspec` and everything else degrades with a clear error.

Durability mapping (see fs.py for the engine's three primitives):

* ``put_atomic``   -> ``pipe_file`` — one whole-object PUT, which object
  stores make atomic (readers see the old object or the new one, never
  a torn write). No rename emulation.
* ``create_exclusive`` -> ``pipe_file(mode="create")`` where the backend
  supports conditional writes (s3fs>=2024.6 maps it to If-None-Match;
  gcsfs to x-goods-if-generation-match). Backends without it fall back
  to exists()+pipe_file — NOT atomic under concurrent writers, which
  weakens the writer lock and the snapshot-log seq claim to advisory;
  the fallback is reported via :func:`conditional_put_supported` so
  deployments can decide whether that is acceptable.
* ``claim_stale``  -> unconditional delete guarded by FileNotFoundError;
  true conditional delete (If-Match on the observed ETag) is not in the
  portable fsspec surface, so two stale-lease claimers can in principle
  both see success — the subsequent ``create_exclusive`` race then picks
  exactly one winner on conditional-put backends.
* ``append_line``  -> read-modify-PUT. Only the metrics log uses append
  on non-native filesystems (the snapshot log writes per-entry objects
  — engine._snapshot_log_append), so this is bounded and lock-guarded.
"""

from __future__ import annotations

from .fs import FileSystem, register_filesystem

# credential-bearing fsspec kwargs never exported to executorEnv (the
# common s3fs/gcsfs/adlfs/webhdfs spellings)
_SECRET_OPTION_KEYS = frozenset({
    "key", "secret", "token", "password", "username", "account_key",
    "sas_token", "client_secret", "access_key_id", "secret_access_key",
    "session_token", "credential", "api_key",
})


class FsspecFS(FileSystem):
    """Adapter from fsspec's AbstractFileSystem to the engine seam."""

    native_paths = False

    def __init__(self, afs):
        self._fs = afs
        self._conditional = None  # probed lazily on first create_exclusive

    def _invalidate(self, path: str) -> None:
        """Bust fsspec's dircache before a freshness-sensitive read:
        s3fs/gcsfs answer ls() — and often exists() via the parent
        listing — from a process-local cache, so without this a reader
        process never sees objects committed by another process (new
        snapshot-log entries, another writer's lock)."""
        inv = getattr(self._fs, "invalidate_cache", None)
        if inv is not None:
            try:
                inv(path)
            except TypeError:  # some backends take no path argument
                inv()

    # -- reads -----------------------------------------------------------
    def open_read(self, path: str):
        return self._fs.open(path, "rb")

    def exists(self, path: str) -> bool:
        # deliberately NOT cache-busted: exists() probes immutable
        # objects (block files, committed log entries) on hot decode
        # paths; the freshness-critical reads go through listdir (the
        # snapshot-log dir) and create_exclusive (the lock), which do
        # invalidate
        return self._fs.exists(path)

    def listdir(self, path: str) -> list[str]:
        self._invalidate(path)
        try:
            entries = self._fs.ls(path, detail=False)
        except FileNotFoundError:
            return []
        return [e.rstrip("/").rsplit("/", 1)[-1] for e in entries]

    def getsize(self, path: str) -> int:
        return int(self._fs.size(path))

    # -- writes ----------------------------------------------------------
    def put_atomic(self, path: str, data: bytes) -> int:
        self._fs.pipe_file(path, data)
        return len(data)

    def append_line(self, path: str, line: str) -> None:
        # read-then-PUT keyed on the READ, not on exists(): a stale
        # dircache answering exists()=False would truncate the log to
        # just this line; cat_file + FileNotFoundError is cache-safe
        try:
            old = self._fs.cat_file(path)
        except FileNotFoundError:
            old = b""
        self._fs.pipe_file(path, old + line.encode())

    def remove(self, path: str) -> None:
        self._fs.rm_file(path)

    def makedirs(self, path: str) -> None:
        # object stores have no directories; some fsspec backends (local,
        # memory) do — create best-effort for those
        try:
            self._fs.makedirs(path, exist_ok=True)
        except (NotImplementedError, OSError):
            pass

    def create_exclusive(self, path: str, data: bytes) -> bool:
        self._invalidate(path.rsplit("/", 1)[0])
        if self._conditional is not False:
            try:
                self._fs.pipe_file(path, data, mode="create")
                self._conditional = self._native_create_mode()
                return True
            except FileExistsError:
                self._conditional = self._native_create_mode()
                return False
            except (TypeError, ValueError, NotImplementedError):
                self._conditional = False  # backend lacks create-mode at all
        # non-atomic fallback (see module docstring)
        if self._fs.exists(path):
            return False
        self._fs.pipe_file(path, data)
        return True

    def claim_stale(self, path: str) -> bool:
        try:
            self._fs.rm_file(path)
        except FileNotFoundError:
            return False
        return True

    def _native_create_mode(self) -> bool:
        """Whether the BACKEND (not fsspec's base classes) implements
        the pipe-file path: AbstractFileSystem merely emulates
        ``mode="create"`` with a non-atomic exists()+write, which every
        backend accepts — so acceptance alone must not be reported as
        atomicity. Heuristic: the backend class overrides ``pipe_file``
        or ``_pipe_file`` (s3fs/gcsfs route the If-None-Match /
        if-generation-match header through ``_pipe_file``; the sync base
        class has no ``_pipe_file`` at all, so resolve with getattr —
        a bare attribute access there would make this always-False)."""
        try:
            from fsspec import AbstractFileSystem

            bases = [AbstractFileSystem]
            try:
                from fsspec.asyn import AsyncFileSystem

                bases.append(AsyncFileSystem)
            except ImportError:
                pass
            cls = type(self._fs)
            for name in ("pipe_file", "_pipe_file"):
                mine = getattr(cls, name, None)
                if mine is None:
                    continue
                if all(getattr(b, name, None) is not mine for b in bases):
                    return True  # backend-defined, not inherited emulation
            return False
        except Exception:
            return False

    def conditional_put_supported(self) -> bool | None:
        """True once a create_exclusive call confirmed the backend itself
        handles ``mode="create"`` (atomic conditional PUT); False when
        only fsspec's non-atomic exists()+write emulation ran (the
        single-writer lock and snapshot-seq claims are then advisory —
        see module docstring); None before the first call probes it."""
        return self._conditional


def register_fsspec(scheme: str, **storage_options) -> FsspecFS:
    """Register ``scheme://`` paths (e.g. ``"s3"``, ``"gs"``) to route
    through fsspec. Raises ImportError with guidance when fsspec (or the
    backend package) is absent."""
    try:
        import fsspec
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "register_fsspec requires the 'fsspec' package (plus the "
            "backend, e.g. s3fs for s3://): pip install fsspec s3fs"
        ) from e
    adapter = FsspecFS(fsspec.filesystem(scheme, **storage_options))
    register_filesystem(scheme, adapter)
    # Announce for executor processes (see fs._auto_register_fsspec).
    # TIMING: call register_fsspec BEFORE building the SparkSession —
    # sparkcodec.session.get_spark forwards these env vars to
    # spark.executorEnv at session creation; a session built earlier
    # never sees them (its JVM snapshotted the environment). On foreign
    # session builders set spark.executorEnv.SPARKCODEC_FSSPEC_* yourself.
    # Non-secret storage_options ride as JSON so executors construct the
    # SAME backend (endpoint_url, anon, region). Credential kwargs are
    # STRIPPED from the announcement — executorEnv values appear in the
    # Spark UI and environment dumps — so executors authenticate via the
    # backend's default chain (instance profile, env). Options that
    # don't JSON-serialize (an SSLContext in client_kwargs, ...) are
    # likewise kept driver-side only.
    import json as _json
    import os

    cur = [
        s for s in os.environ.get("SPARKCODEC_FSSPEC_SCHEMES", "").split(",") if s
    ]
    if scheme not in cur:
        os.environ["SPARKCODEC_FSSPEC_SCHEMES"] = ",".join(cur + [scheme])
    shareable = {
        k: v for k, v in storage_options.items() if k not in _SECRET_OPTION_KEYS
    }
    if shareable:
        opts = _json.loads(os.environ.get("SPARKCODEC_FSSPEC_OPTIONS", "{}"))
        try:
            opts[scheme] = _json.loads(_json.dumps(shareable))
        except (TypeError, ValueError):
            pass  # non-serializable options stay driver-local
        else:
            os.environ["SPARKCODEC_FSSPEC_OPTIONS"] = _json.dumps(opts)
    return adapter
