"""SRS generation with the exponent axis sharded over the virtual mesh
== single-device generation, bit-for-bit (SURVEY §2.3 sharded SRS row)."""
import numpy as np

from sonic_tpu.parallel.mesh import make_mesh
from sonic_tpu.srs import SRS


def test_srs_new_sharded_matches():
    d = 10
    plain = SRS.new(d, x=23, alpha=29)
    sharded = SRS.new(d, x=23, alpha=29, mesh=make_mesh(8))
    for name in ("g_x", "g_ax", "h_x", "h_ax"):
        a, b = getattr(plain, name), getattr(sharded, name)
        assert np.array_equal(np.asarray(a.x), np.asarray(b.x)), name
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), name
        assert np.array_equal(np.asarray(a.inf), np.asarray(b.inf)), name
