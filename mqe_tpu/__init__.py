"""mqe_tpu: TPU-native multi-agent quadruped environment suite.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ziyanx02/multiagent-quadruped-environment (reference layout documented in
/root/repo/SURVEY.md). The CUDA/PhysX simulation backend of the reference is
replaced by a batched Featherstone rigid-body engine with penalty contact
against heightfield terrain, everything living under a single jit with the env
axis sharded across a TPU mesh.
"""
import os

MQE_TPU_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")

__version__ = "0.1.0"
