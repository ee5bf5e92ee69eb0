"""Test-environment shim: make `google.protobuf` importable in the
driver AND the Python workers so transformWithStateInPandas (state-
server RPC speaks protobuf) can actually execute in this sandbox.

The sandbox has no network and no installed protobuf wheel, but the
google-cloud-sdk ships a vendored pure-Python protobuf runtime
(6.32.0). pyspark 4.1's generated StateMessage_pb2 was built with
gencode 6.33.0, and protobuf's runtime-version gate refuses a runtime
one minor version older — for this proto (plain proto3, no editions
features past 6.32) the gap is benign, so the gate is relaxed to a
pass-through. This file is picked up via PYTHONPATH (site.py imports
`sitecustomize` from sys.path at interpreter start, which is what
propagates it into pyspark's daemon/runner workers). The probe is for
`google.protobuf.descriptor` — not the bare package — because an empty
`google.protobuf` NAMESPACE package (PEP 420 side effect of unrelated
`google/` dirs on a worker's path) would otherwise mask the missing
runtime; any such stale namespace modules are evicted before the
vendored regular package is resolved. A real installed protobuf always
wins: the vendored path is appended, never prepended.
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _ensure_protobuf() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return  # real (or already-shimmed) runtime present
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
        return
    if _GAE not in sys.path:
        sys.path.append(_GAE)
    # drop stale namespace-package modules so the regular package resolves
    for name in [
        m for m in list(sys.modules) if m == "google" or m.startswith("google.")
    ]:
        mod = sys.modules[name]
        if getattr(mod, "__file__", None) is None:  # namespace pkg
            del sys.modules[name]
    import importlib

    importlib.invalidate_caches()
    try:
        from google.protobuf import runtime_version as _rv

        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(*args, **kwargs):
            try:
                _orig(*args, **kwargs)
            except _rv.VersionError:
                pass

        _rv.ValidateProtobufRuntimeVersion = _lenient
        from google.protobuf import descriptor  # noqa: F401
    except Exception:
        pass


_ensure_protobuf()
