from setuptools import setup, find_packages

setup(
    name="falcon_tpu",
    version="0.1.0",
    description="TPU-native hierarchical genome assembler "
                "(JAX/XLA/Pallas re-design of the FALCON/HGAP engine)",
    packages=find_packages(include=["falcon_tpu", "falcon_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
    entry_points={
        "console_scripts": [
            "ftpu-run = falcon_tpu.pipeline.driver:main",
        ],
    },
)
