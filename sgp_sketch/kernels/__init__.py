"""Pure-numpy sketch kernels. No pyspark imports here — everything operates on
numpy arrays so the same code runs inside Arrow-batched pandas UDFs and in
plain unit tests.

Every kernel exposes the same surface:
    update(state, values)    vectorized batch update, returns state
    merge(a, b)              associative merge, returns new state
    estimate(state, ...)     query the sketch
    to_bytes(state) / from_bytes(buf)   versioned little-endian serialization
"""

from . import (hashing, hll, cms, bloom, kll, tdigest,  # noqa: F401
               theta, mg, fd, cs, dd)  # noqa: F401
