"""Environment compatibility shims.

``transformWithStateInPandas`` (Spark 4's successor stateful API,
SURVEY.md §2.5) talks to the JVM state server over protobuf, so its
Python workers need ``google.protobuf`` at runtime. This container has
no protobuf wheel and no network — but it does carry a pure-Python
protobuf runtime vendored inside the (public) Google Cloud SDK's App
Engine tooling. ``ensure_protobuf()`` discovers such a runtime and wires
it up BEFORE the JVM launches, so every spawned Python worker inherits
it via PYTHONPATH:

- probe order: already-importable ``google.protobuf.descriptor`` wins;
  then ``$SPARK_GRAFT_PROTOBUF_PATH``; then known vendored locations.
- the vendored runtime (6.32) is one minor older than Spark's gencode
  (6.33); the wire format is stable across that gap and protobuf ships
  an official escape hatch for exactly this case
  (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``), which we set only
  when the fallback path is in use.

``transformWithStateInPandas`` additionally needs a state store with
column families — RocksDB, not the HDFS-backed default; the operator
sets that per-session (see operators/stateful.py). On a real cluster
with a normal protobuf install none of this fires.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

#: Pure-Python protobuf runtimes vendored by public SDKs, probed in order.
PROTOBUF_FALLBACKS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_checked: bool | None = None

#: set when protobuf rides a vendored fallback dir (None on a real
#: install); TWS uses it to verify the JVM env carries the path
fallback_dir: str | None = None


def _importable() -> bool:
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here AND in spawned workers.

    Must run before the Spark JVM starts: the JVM snapshots the
    environment at launch and passes it to every Python worker it forks,
    so a late PYTHONPATH edit would fix the driver but not the workers.
    Returns True if a usable runtime is (now) available. Idempotent.
    """
    global _checked
    if _checked is not None:
        return _checked
    if _importable():
        _checked = True
        return True
    candidates = [os.environ.get("SPARK_GRAFT_PROTOBUF_PATH", "")] + PROTOBUF_FALLBACKS
    for cand in candidates:
        if not cand or not os.path.isfile(
            os.path.join(cand, "google", "protobuf", "descriptor.py")
        ):
            continue
        sys.path.append(cand)  # append: never shadow a real install
        importlib.invalidate_caches()
        if _importable():
            os.environ["PYTHONPATH"] = (
                os.environ.get("PYTHONPATH", "") + os.pathsep + cand
            ).strip(os.pathsep)
            # gencode may be slightly newer than the vendored runtime;
            # protobuf's own opt-out for wire-compatible skew
            os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
            global fallback_dir
            fallback_dir = cand
            _checked = True
            return True
        sys.path.remove(cand)
    _checked = False
    return False


def tws_ready() -> tuple[bool, str]:
    """(available, reason) for transformWithStateInPandas in this
    process. Call before building a TWS query; raise the reason as an
    actionable error if unavailable."""
    if not ensure_protobuf():
        return False, (
            "transformWithStateInPandas needs google.protobuf, which is "
            "not installed and no vendored runtime was found; install "
            "protobuf or point SPARK_GRAFT_PROTOBUF_PATH at a directory "
            "containing google/protobuf. applyInPandasWithState covers "
            "the same semantics without protobuf."
        )
    return True, ""
