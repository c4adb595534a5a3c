from setuptools import find_packages, setup

setup(
    name="mqe-tpu",
    version="0.1.0",
    description=(
        "TPU-native multi-agent quadruped RL environment suite "
        "(JAX/XLA/Pallas re-design of ziyanx02/multiagent-quadruped-environment)"
    ),
    packages=find_packages(include=["mqe_tpu", "mqe_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
    ],
)
