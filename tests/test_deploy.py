"""Deployment artifact tests: the --py-files zip must be importable on a
worker that has ONLY the zip on sys.path (the spark-submit --py-files
contract, north-rule deployment mode)."""

import subprocess
import sys


def test_package_zip_importable_standalone(tmp_path):
    from sgp_sketch.deploy import package_zip

    dest = str(tmp_path / "sgp_sketch.zip")
    assert package_zip(dest) == dest
    # fresh interpreter, cwd outside the repo, only the zip on sys.path —
    # exactly what a Spark python worker sees with --py-files
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import numpy as np\n"
        "from sgp_sketch.kernels import registry\n"
        "st = registry.make('hll', p=12)\n"
        "st.update(np.arange(1000, dtype=np.int64).view(np.uint64))\n"
        "blob = st.to_bytes()\n"
        "rt = registry.from_bytes(blob)\n"
        "assert abs(rt.estimate() - 1000) < 1000 * 0.05\n"
        "from sgp_sketch.kernels.hashing import hash64\n"
        "from sgp_sketch import dedup\n"
        "sig = dedup.minhash_batch([np.arange(40, dtype=np.int64)], k=16)\n"
        "assert sig.shape == (1, 16)\n"
        "print('ZIPOK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code, dest],
                         capture_output=True, text=True, cwd=str(tmp_path),
                         timeout=120)
    assert out.returncode == 0, out.stderr
    assert "ZIPOK" in out.stdout
