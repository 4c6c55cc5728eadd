"""Environment-compatibility plumbing.

Nothing here changes query semantics; each helper makes an optional
Spark feature usable on a dev image that is missing a supporting
library, and is a documented no-op on a properly provisioned cluster.
"""

from __future__ import annotations

import os
import sys

# Google Cloud SDK ships a pure-python protobuf runtime inside its
# bundled App Engine tooling; the `google` package dir is self-
# contained (protobuf + appengine subpackages only), so exposing it
# through a one-symlink shim dir adds no other top-level modules to
# worker sys.path.
_BUNDLED_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
_SHIM_DIR = "/tmp/the_hive_spark_pbshim"


def ensure_tws_protobuf() -> bool:
    """Make transformWithState's protobuf dependency importable.

    Spark 4's transformWithState operator speaks a protobuf protocol
    between the per-partition state server and the Python workers;
    PySpark imports ``google.protobuf`` at query start in BOTH the
    driver-side schema-discovery worker and the executor workers. On
    a cluster with protobuf installed this returns True without side
    effects. On this image (no protobuf wheel, installs off) it
    exposes the Cloud SDK's bundled pure-python runtime via a shim
    dir on PYTHONPATH, and accepts the one-minor-older runtime
    (PySpark 4.1.2 gencode 6.33 vs bundled runtime 6.32 — same major,
    no 6.33-only features in StateMessage.proto) through protobuf's
    own escape-hatch env var.

    MUST run before the process's first SparkSession: python-worker
    env is frozen when the JVM gateway launches. Returns False when
    no runtime can be found — callers skip the TWS path and fall back
    to applyInPandasWithState.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_BUNDLED_GOOGLE, "protobuf")):
        return False
    os.makedirs(_SHIM_DIR, exist_ok=True)
    link = os.path.join(_SHIM_DIR, "google")
    if not os.path.islink(link):
        try:
            os.symlink(_BUNDLED_GOOGLE, link)
        except FileExistsError:
            pass
    cur = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + cur if cur else "")
        )
    # protobuf's own supported override for "runtime older than
    # gencode within the same major" (runtime_version.py reads it);
    # setdefault so an explicit operator choice wins
    os.environ.setdefault(
        "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
    )
    if _SHIM_DIR not in sys.path:
        # append, not prepend: a real site-packages install wins
        sys.path.append(_SHIM_DIR)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
