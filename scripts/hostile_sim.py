"""driver_sim under a HOSTILE session: ANSI mode on, non-UTC process
timezone, adversarial shuffle partitioning. Every oracle comparison must
still hash-match bit for bit — proving the engine pins its own semantics
(UTC session TZ, explicit casts, order-independent sums) instead of
depending on friendly defaults."""

import os
import runpy
import sys

os.environ["TZ"] = "America/New_York"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import neurondb_spark.session as S  # noqa: E402

_orig = S.get_spark


def _hostile(app: str = "hostile", shuffle_partitions=None, extra_conf=None):
    ec = dict(extra_conf or {})
    ec.update({
        "spark.sql.ansi.enabled": "true",
        "spark.driver.extraJavaOptions": "-Duser.timezone=America/New_York",
    })
    return _orig(app, shuffle_partitions=7, extra_conf=ec)


S.get_spark = _hostile
sys.argv = [sys.argv[0], *(sys.argv[1:] or ["/root/testdata/sf0.01"])]
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "driver_sim.py"), run_name="__main__")
