"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no multi-device test story at all (SURVEY.md §4.6); we
test sharding honestly on CPU via XLA's host-platform device multiplier.
Must run before the first `import jax` anywhere in the test session.
"""

import os

# NOTE: the ambient environment routes jax at the tunneled real TPU twice:
# JAX_PLATFORMS=axon in the shell AND /root/.axon_site/sitecustomize.py which
# registers the axon PJRT plugin and programmatically sets
# jax_platforms='axon,cpu' (overriding the env var). Both must be overridden.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
