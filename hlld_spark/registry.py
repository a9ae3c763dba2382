"""Named-sketch registry: the reference's command surface re-expressed.

Reproduces the test-visible semantics of hlld's 9 protocol commands
(/root/reference/src/handler_constants.c:54-65, conn_handler.c):

  create  — eps↔precision coupling (given eps, derive p, re-derive the
            actual eps from p — src/conn_handler.c:257-271); name regex
            ``^[^ \\t\\r\\n]{1,200}$`` (src/handler_constants.c:69);
            responses Done / Exists / Delete in progress
  set/bulk — add keys (Done / Set does not exist); fault-in if proxied
  info    — in_memory, page_ins, page_outs, epsilon, precision, sets,
            size, storage (src/conn_handler.c:438-515); reads never
            fault a proxied set in: size comes from the flushed cache
            (src/set.c:297-303)
  list    — sorted, prefix-filtered ``name eps precision bytes estimate``
  drop    — marks pending-delete; physical removal happens at vacuum()
            (the MVCC delta + vacuum thread, src/set_manager.c:445-465,
            :1058-1141 — synchronous here, same observable states)
  close   — flush + unmap, stays on disk & in registry (page_out)
  clear   — forget a *proxied* set without deleting its files; on a hot
            set returns "Set is not proxied. Close it first."
            (src/set_manager.c:475-501); re-create rediscovers the data
  flush   — persist dirty registers + config with cached size; no-op if
            clean (src/set.c:157-196)

On-disk layout IS the reference's (src/set.c:18-28): a directory
``hlld.<name>/`` holding ``config.ini`` (the exact
update_filename_from_set_config format, src/set.c:55-74) and
``registers.mmap`` (raw packed registers, byte-identical) — a stock hlld
daemon pointed at this data dir discovers and serves these sets. The
pre-r3 names (``config.json`` / ``data.mmap``) remain read-compatible.

Distributed adds plug in via :meth:`SketchRegistry.add_dataframe`, which
runs the Spark two-phase build and merges the result into the named set.
"""

from __future__ import annotations

import configparser
import json
import os
import re
import shutil
import warnings

import numpy as np

from .core import hll
from .core.accumulator import HllSpec
from .core.hashing import hll_hash

VALID_NAME = re.compile(r"^[^ \t\r\n]{1,200}\Z")  # src/handler_constants.c:69

DONE = "Done"
EXISTS = "Exists"
DELETE_IN_PROGRESS = "Delete in progress"
SET_NOT_FOUND = "Set does not exist"
NOT_PROXIED = "Set is not proxied. Close it first."
BAD_NAME = "Client Error: Bad set name"


class HlldError(Exception):
    pass


class _Set:
    __slots__ = ("name", "precision", "eps", "in_memory", "registers", "dirty", "size_cache", "page_ins", "page_outs", "sets", "is_hot")

    def __init__(self, name, precision, eps, in_memory):
        self.name = name
        self.precision = precision
        self.eps = eps
        self.in_memory = in_memory
        self.registers: np.ndarray | None = None  # None == proxied (unmapped)
        self.dirty = False
        self.size_cache = 0.0
        self.page_ins = 0
        self.page_outs = 0
        self.sets = 0  # set-op counter (src/set.h:15-19)
        self.is_hot = True  # new sets are hot (set_manager.c add_set is_hot=1)


class SketchRegistry:
    def __init__(self, root_dir: str, default_eps: float = hll.DEFAULT_EPS, default_precision: int | None = None):
        self.root = root_dir
        os.makedirs(root_dir, exist_ok=True)
        self.default_eps = default_eps
        self.default_precision = default_precision or hll.precision_for_error(default_eps)
        self._sets: dict[str, _Set] = {}
        self._pending_delete: set[str] = set()
        self._discover()

    # --- persistence layout (mirrors src/set.c:18-28) ------------------------

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, f"hlld.{name}")

    def _config_path(self, name: str) -> str:
        # reference CONFIG_FILENAME (src/set.c:28)
        return os.path.join(self._dir(name), "config.ini")

    def _data_path(self, name: str) -> str:
        # reference DATA_FILE_NAME (src/set.c:22)
        return os.path.join(self._dir(name), "registers.mmap")

    def _legacy_config_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "config.json")

    def _legacy_data_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "data.mmap")

    def _existing_data_path(self, name: str) -> str | None:
        """registers.mmap (reference name) preferred; data.mmap (pre-r3
        layout of this engine) read-compat."""
        for p in (self._data_path(name), self._legacy_data_path(name)):
            if os.path.exists(p):
                return p
        return None

    def _read_config(self, name: str) -> dict | None:
        """Read a set's config: ``config.ini`` in the reference's format
        (keys as parsed by src/config.c:391-427: size / default_eps /
        default_precision / in_memory under [hlld]), falling back to the
        pre-r3 ``config.json``. Returns None when neither exists."""
        ini = self._config_path(name)
        if os.path.exists(ini):
            # ADVICE r4: a skipped-corrupt dir must leave a trace — an
            # operator whose set vanishes from `list` needs to know why
            def _skip(reason: str) -> None:
                warnings.warn(
                    f"registry discovery skipping sketch set {name!r}: "
                    f"corrupt/partial {ini} ({reason})",
                    RuntimeWarning,
                    stacklevel=3,
                )

            cp = configparser.ConfigParser(strict=False)
            try:
                cp.read(ini)
            except configparser.Error:  # unparseable: skip, don't wedge boot
                _skip("unparseable INI")
                return None
            if "hlld" not in cp:  # malformed: skip, don't wedge _discover
                _skip("missing [hlld] section")
                return None
            sec = cp["hlld"]
            try:
                p = sec.getint("default_precision", fallback=None)
            except ValueError:  # non-integer garbage
                _skip("non-integer default_precision")
                return None
            if p is None:
                # ADVICE r3: a corrupt/partial config.ini must not
                # prevent the whole registry from constructing (the
                # reference tolerates missing keys at boot) — and the
                # eps fallback must only be computed AFTER validating p
                _skip("missing default_precision")
                return None
            eps = sec.getfloat("default_eps", fallback=None)
            return {
                "precision": p,
                "eps": eps if eps is not None else hll.error_for_precision(p),
                "in_memory": bool(sec.getint("in_memory", fallback=0)),
                "size": sec.getfloat("size", fallback=0.0),
            }
        legacy = self._legacy_config_path(name)
        if os.path.exists(legacy):
            with open(legacy) as f:
                return json.load(f)
        return None

    def _discover(self) -> None:
        """Restore registry state from disk (reference: faulted-in at boot,
        src/set_manager.c discovery)."""
        if not os.path.isdir(self.root):
            return
        for entry in sorted(os.listdir(self.root)):
            if not entry.startswith("hlld."):
                continue
            name = entry[len("hlld.") :]
            cfg = self._read_config(name)
            if cfg is None:
                continue
            s = _Set(name, cfg["precision"], cfg["eps"], cfg.get("in_memory", False))
            s.size_cache = cfg.get("size", 0.0)
            self._sets[name] = s

    # --- C1 create ------------------------------------------------------------

    def create(
        self,
        name: str,
        precision: int | None = None,
        eps: float | None = None,
        in_memory: bool | int = False,
        options: list[tuple[str, object]] | None = None,
    ) -> str:
        """C1 create — reference-exact option semantics.

        ``options`` is the wire-ordered [(kind, value), ...] list; each
        option is applied sequentially over the defaults exactly like
        conn_handler.c:244-295 (precision= derives eps, eps= derives
        precision then re-derives the actual eps, last option wins), and
        the RESULT is validated like sane_default_precision /
        sane_default_eps / sane_in_memory (src/config.c:264-337):
        out-of-range values raise Bad arguments — never clamp. The
        keyword form is sugar for options=[("precision", p)] etc.
        """
        if not VALID_NAME.match(name or ""):
            raise HlldError(BAD_NAME)
        if name in self._pending_delete:
            return DELETE_IN_PROGRESS
        if name in self._sets:
            return EXISTS
        if options is None:
            options = []
            if precision is not None:
                options.append(("precision", precision))
            if eps is not None:
                options.append(("eps", eps))
            if in_memory:
                options.append(("in_memory", int(in_memory)))
        # sequential option application over the config defaults
        # (src/conn_handler.c:256-282): each step re-derives the coupled
        # (precision, eps) pair; out-of-range intermediates produce
        # out-of-range results that fail validation below
        p = self.default_precision
        e = hll.error_for_precision(p)
        mem = 0
        for kind, val in options:
            if kind == "precision":
                p = int(val)
                e = hll.error_for_precision(p)
            elif kind == "eps":
                p = hll.precision_for_error(float(val))
                e = hll.error_for_precision(p)
            elif kind == "in_memory":
                mem = int(val)
            else:
                raise HlldError("Client Error: Bad arguments")
        # validation — reject, don't clamp (sane_default_* in config.c)
        if not (hll.HLL_MIN_PRECISION <= p <= hll.HLL_MAX_PRECISION):
            raise HlldError("Client Error: Bad arguments")
        if e > hll.error_for_precision(hll.HLL_MIN_PRECISION) or e < hll.error_for_precision(hll.HLL_MAX_PRECISION):
            raise HlldError("Client Error: Bad arguments")
        if mem not in (0, 1):
            raise HlldError("Client Error: Bad arguments")
        precision = p
        in_memory = bool(mem)
        actual_eps = e
        s = _Set(name, precision, actual_eps, in_memory)
        existing_data = self._existing_data_path(name) is not None
        if existing_data:
            # re-create over cleared (not dropped) files rediscovers state
            # (tests/test_setmgr.c:430-470)
            cfg = self._read_config(name)
            if cfg is not None:
                s.precision, s.eps = cfg["precision"], cfg["eps"]
                s.size_cache = cfg.get("size", 0.0)
        else:
            s.registers = hll.new_registers(precision)
            s.dirty = True
            os.makedirs(self._dir(name), exist_ok=True)
            if not in_memory:
                self._write_config(s)
        self._sets[name] = s
        return DONE

    # --- C2/C3 set / bulk -------------------------------------------------------

    def _require(self, name: str) -> _Set:
        s = self._sets.get(name)
        if s is None or name in self._pending_delete:
            raise HlldError(SET_NOT_FOUND)
        s.is_hot = True  # any access marks hot (set_manager.c take_set)
        return s

    def _fault_in(self, s: _Set) -> None:
        if s.registers is not None:
            return
        path = self._existing_data_path(s.name)
        if path is not None:
            with open(path, "rb") as f:
                s.registers = hll.from_hlld_bytes(f.read(), s.precision)
        else:
            s.registers = hll.new_registers(s.precision)
        s.page_ins += 1

    def set(self, name: str, key: str) -> str:
        return self.bulk(name, [key])

    def bulk(self, name: str, keys) -> str:
        s = self._require(name)
        self._fault_in(s)
        hll.add_hashes(s.registers, hll_hash(keys), s.precision)
        s.sets += len(keys)
        s.dirty = True
        return DONE

    def merge_registers(self, name: str, registers: np.ndarray, n_rows: int = 0) -> str:
        """Merge an externally-built register vector (e.g. the output of a
        distributed Spark build) into the named set."""
        s = self._require(name)
        self._fault_in(s)
        if len(registers) != len(s.registers):
            raise HlldError(f"Client Error: precision mismatch ({len(registers)} vs {len(s.registers)} registers)")
        s.registers = hll.merge(s.registers, registers)
        s.sets += n_rows
        s.dirty = True
        return DONE

    def add_dataframe(self, name: str, df, col: str) -> str:
        """Distributed ``bulk``: two-phase Spark build, merged in."""
        from .operators.sketch import build_sketches

        s = self._require(name)
        spec = HllSpec(precision=s.precision)
        row = build_sketches(df, [], col, spec).collect()
        if not row:
            return DONE
        regs, _ = hll.deserialize(bytes(row[0]["sketch"]))
        return self.merge_registers(name, regs, int(row[0]["n_rows"]))

    # --- C4 info / C5 list -----------------------------------------------------

    def _size(self, s: _Set) -> float:
        # reads never fault in: proxied sets answer from the flushed cache
        # (src/set.c:297-303)
        if s.registers is None:
            return s.size_cache
        return hll.cardinality(s.registers, s.precision)

    def info(self, name: str) -> dict:
        s = self._require(name)
        return {
            "in_memory": 1 if s.in_memory else 0,
            "page_ins": s.page_ins,
            "page_outs": s.page_outs,
            "eps": s.eps,
            "precision": s.precision,
            "sets": s.sets,
            "size": self._size(s),
            "storage": hll.bytes_for_precision(s.precision),
        }

    def list(self, prefix: str | None = None) -> list[dict]:
        out = []
        for name in sorted(self._sets):  # ART iteration is name-sorted (CHANGELOG.mdown:60)
            if name in self._pending_delete:
                continue
            if prefix and not name.startswith(prefix):
                continue
            s = self._sets[name]
            out.append(
                {
                    "name": name,
                    "eps": s.eps,
                    "precision": s.precision,
                    "bytes": hll.bytes_for_precision(s.precision),
                    "estimate": self._size(s),
                }
            )
        return out

    # --- C6 drop / vacuum --------------------------------------------------------

    def drop(self, name: str, defer_vacuum: bool = False) -> str:
        self._require(name)
        self._pending_delete.add(name)
        if not defer_vacuum:
            self.vacuum()
        return DONE

    def vacuum(self) -> None:
        """Physically remove pending-deleted sets (the vacuum thread,
        src/set_manager.c:1058-1141)."""
        for name in list(self._pending_delete):
            self._sets.pop(name, None)
            shutil.rmtree(self._dir(name), ignore_errors=True)
            self._pending_delete.discard(name)

    # --- C7 close / C8 clear -----------------------------------------------------

    def close(self, name: str) -> str:
        s = self._require(name)
        if s.in_memory:
            return DONE  # no-op for in-memory sets (src/set_manager.c:513-533)
        self.flush(name)
        if s.registers is not None:
            s.registers = None
            s.page_outs += 1
        return DONE

    def clear(self, name: str) -> str:
        s = self._require(name)
        if s.registers is not None:
            raise HlldError(NOT_PROXIED)  # src/set_manager.c:475-501
        del self._sets[name]  # files stay on disk; re-create rediscovers
        return DONE

    def cold_sweep(self) -> list[str]:
        """Unmap sets untouched since the previous sweep — the cold-unmap
        background thread's pass (src/background.c:152-194 +
        set_manager.c:779-806): a hot set has its flag cleared and is
        skipped; an already-proxied set is skipped; anything else is
        flushed and paged out. Two sweeps without access ⇒ unmapped.
        Returns the names unmapped."""
        unmapped = []
        for name, s in list(self._sets.items()):
            if name in self._pending_delete:
                continue
            if s.is_hot:
                s.is_hot = False
                continue
            if s.registers is None or s.in_memory:
                continue  # already proxied / never persisted
            self.flush(name)
            s.registers = None
            s.page_outs += 1
            s.is_hot = False  # close() path re-marks hot via _require
            unmapped.append(name)
        return unmapped

    # --- C9 flush ------------------------------------------------------------------

    def _write_config(self, s: _Set) -> None:
        """Write ``config.ini`` byte-compatible with the reference's
        update_filename_from_set_config (src/set.c:55-74: ``[hlld]`` with
        size %llu / default_eps %f / default_precision %d / in_memory %d)
        so a stock hlld daemon pointed at this data dir discovers and
        serves sets flushed by this engine."""
        os.makedirs(self._dir(s.name), exist_ok=True)
        with open(self._config_path(s.name), "w") as f:
            f.write(
                "[hlld]\n"
                f"size = {int(s.size_cache)}\n"
                f"default_eps = {s.eps:f}\n"
                f"default_precision = {s.precision}\n"
                f"in_memory = {int(s.in_memory)}\n"
            )

    def flush(self, name: str | None = None) -> str:
        names = [name] if name else list(self._sets)
        for n in names:
            s = self._require(n)
            if s.in_memory or not s.dirty or s.registers is None:
                continue  # idempotent when clean (src/set.c:166-168)
            # reference caches the size as uint64 (set_config.size via
            # hset_size, src/set.c:171,297-303) — truncate like C does
            s.size_cache = int(hll.cardinality(s.registers, s.precision))
            os.makedirs(self._dir(n), exist_ok=True)
            with open(self._data_path(n), "wb") as f:
                f.write(hll.to_hlld_bytes(s.registers))
            self._write_config(s)
            s.dirty = False
        return DONE
