"""On-device validation certificates.

The framework's fast paths (the Pallas locate kernel, the blocked-gather
unary) are gated by on-device probes that prove them equivalent to the
always-correct XLA reference paths (VERDICT r3 weak #1: no unvalidated fast
path may ever produce a headline number). The probes are cheap to execute
but expensive to *reach* on a remote-tunnel TPU: each one costs tens of
seconds of compile-cache loads and tunnel round-trips, which in round 4
pushed bench.py past the driver's capture budget (BENCH_r04.json: rc=124,
parsed null).

A probe's verdict is a pure function of (the code implementing both paths,
the device kind, the jax/jaxlib version). This module caches verdicts in a
JSON sidecar keyed by exactly that triple: a matching certificate means
THIS code was probed on THIS device kind under THIS jax version and passed
— semantically identical to re-running the probe. Any edit to a fingerprinted
source file, a different chip generation, or a jax upgrade changes the key
and forces a fresh probe. Callers surface provenance (``probe`` vs
``cert:<date>``) so a reader can always tell whether the probe ran in this
process; ``--revalidate`` (bench.py) forces fresh probes.

Store location: ``<repo_root>/validation_certs.json`` when writable (so the
certificate ships with the checkout and the driver's bench capture stays
fast), else ``~/.cache/newmsm_tpu/certs.json``.
"""
from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Sequence

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _store_path() -> str:
    env = os.environ.get("NEWMSM_CERT_PATH")
    if env:
        return env
    repo = os.path.dirname(_PKG_ROOT)
    cand = os.path.join(repo, "validation_certs.json")
    if os.access(repo, os.W_OK):
        return cand
    return os.path.join(os.path.expanduser("~"), ".cache", "newmsm_tpu",
                        "certs.json")


def code_fingerprint(rel_sources: Sequence[str]) -> str:
    """sha256 over the given package-relative source files' bytes."""
    h = hashlib.sha256()
    for rel in sorted(rel_sources):
        p = os.path.join(_PKG_ROOT, rel)
        with open(p, "rb") as f:
            h.update(rel.encode())
            h.update(f.read())
    return h.hexdigest()[:32]


def probe_key(rel_sources: Sequence[str], extra: str = "") -> str:
    """Full certificate key: code hash + device kind + jax version."""
    import jax
    dev = jax.devices()[0]
    return "|".join([code_fingerprint(rel_sources),
                     getattr(dev, "device_kind", dev.platform),
                     jax.__version__, extra])


def lookup(name: str, key: str) -> dict | None:
    """Return the stored certificate for (name, key), or None."""
    path = _store_path()
    try:
        with open(path) as f:
            store = json.load(f)
    except Exception:
        return None
    cert = store.get(name)
    if cert and cert.get("key") == key:
        return cert
    return None


def record(name: str, key: str, ok: bool) -> dict:
    cert = {"key": key, "ok": bool(ok),
            "date": time.strftime("%Y-%m-%d %H:%M")}
    path = _store_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(path) as f:
            store = json.load(f)
    except Exception:
        store = {}
    store[name] = cert
    try:
        with open(path, "w") as f:
            json.dump(store, f, indent=1, sort_keys=True)
    except OSError:
        pass        # read-only checkout: the in-process verdict still holds
    return cert
