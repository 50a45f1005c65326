"""Sketch type registry: dispatch (de)serialization and construction by the
type byte in the blob header, so the Spark layer can carry heterogeneous
sketch states through one BinaryType column."""

from __future__ import annotations

import struct

from . import bloom, cms, cs, dd, fd, hll, kll, mg, moments, tdigest, theta

_TYPES = {
    hll.TYPE_HLL: hll.HLL,
    cms.TYPE_CMS: cms.CMS,
    bloom.TYPE_BLOOM: bloom.Bloom,
    kll.TYPE_KLL: kll.KLL,
    tdigest.TYPE_TDIGEST: tdigest.TDigest,
    theta.TYPE_THETA: theta.Theta,
    mg.TYPE_MG: mg.MG,
    fd.TYPE_FD: fd.FD,
    cs.TYPE_CS: cs.CS,
    dd.TYPE_DD: dd.DD,
    moments.TYPE_MOMENTS: moments.Moments,
}

_FACTORIES = {
    "hll": hll.empty,
    "cms": cms.empty,
    "bloom": bloom.empty,
    "kll": kll.empty,
    "tdigest": tdigest.empty,
    "theta": theta.empty,
    "mg": mg.empty,
    "fd": fd.empty,
    "cs": cs.empty,
    "dd": dd.empty,
    "moments": moments.empty,
}


def from_bytes(buf: bytes):
    magic, _ver, typ = struct.unpack_from("<2sBB", buf, 0)
    if magic != b"SK":
        raise ValueError("bad sketch magic")
    # look up BEFORE calling so a KeyError raised inside a kernel's
    # from_bytes is never misreported as "unknown sketch type"
    cls = _TYPES.get(typ)
    if cls is None:
        raise ValueError(f"unknown sketch type {typ}")
    return cls.from_bytes(buf)


def make(kind: str, **params):
    return _FACTORIES[kind](**params)


def merge_blobs(blobs) -> bytes:
    """Merge an iterable of serialized sketch states of one kind."""
    it = iter(blobs)
    try:
        acc = from_bytes(next(it))
    except StopIteration:
        # bare StopIteration inside a generator becomes an opaque
        # PEP-479 RuntimeError at the mapInPandas/mapInArrow call site
        raise ValueError("merge_blobs: empty blob iterable") from None
    for b in it:
        acc = acc.merge(from_bytes(b))
    return acc.to_bytes()
