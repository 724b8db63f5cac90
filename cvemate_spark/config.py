"""Env-var config override layer for the session factory.

The reference reads every deployment setting from configuration.ini
with environment variables taking precedence
(handlers/config_handler.py:27-37 — os.getenv(NAME, ini_default) per
key). The Spark engine's deployment knobs are session confs; this
module gives them the same precedence chain:

    explicit get_spark() argument  >  environment variable  >  default

Recognized variables (all optional; defaults preserve the tuned
local-mode behavior exactly):

    SPARK_GRAFT_CPUS                local[] parallelism (existing)
    SPARK_GRAFT_DRIVER_MEM          driver memory (existing)
    SPARK_GRAFT_SHUFFLE_PARTITIONS  spark.sql.shuffle.partitions
    SPARK_GRAFT_AQE                 spark.sql.adaptive.enabled
    SPARK_GRAFT_BROADCAST_THRESHOLD spark.sql.autoBroadcastJoinThreshold
    SPARK_GRAFT_WAREHOUSE           spark.sql.warehouse.dir
    SPARK_GRAFT_CONF_<NAME>         any spark conf: the suffix maps to
                                    a conf key by lowercasing and
                                    turning '__' into '.', e.g.
                                    SPARK_GRAFT_CONF_spark__sql__ansi__enabled
                                    (suffix used verbatim apart from
                                    the '__' -> '.' mapping)

On a cluster these become the deployment's spark-submit --conf flags;
the env layer exists so the SAME entrypoints run unmodified in a
container where flags can't be edited — the reference's 12-factor
posture.
"""

from __future__ import annotations

import os

ENV_PREFIX = "SPARK_GRAFT_"

# (env var suffix, spark conf key) — the named fast-path knobs
NAMED_CONFS = (
    ("SHUFFLE_PARTITIONS", "spark.sql.shuffle.partitions"),
    ("AQE", "spark.sql.adaptive.enabled"),
    ("BROADCAST_THRESHOLD", "spark.sql.autoBroadcastJoinThreshold"),
    ("WAREHOUSE", "spark.sql.warehouse.dir"),
)


def env_conf_overrides(environ=None) -> dict[str, str]:
    """The spark-conf dict the environment requests. Named knobs
    first, then generic SPARK_GRAFT_CONF_* passthroughs (which win on
    collision, being the most explicit form)."""
    env = os.environ if environ is None else environ
    out: dict[str, str] = {}
    for suffix, conf in NAMED_CONFS:
        v = env.get(ENV_PREFIX + suffix)
        if v is not None and v != "":
            out[conf] = v
    generic_prefix = ENV_PREFIX + "CONF_"
    for k, v in env.items():
        if k.startswith(generic_prefix) and v != "":
            out[k[len(generic_prefix):].replace("__", ".")] = v
    return out
