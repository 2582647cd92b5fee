import os

from setuptools import find_packages, setup


def read(fname):
    path = os.path.join(os.path.dirname(__file__), fname)
    with open(path) as f:
        return f.read()


setup(
    name="tartangan-tpu",
    version="0.1.0",
    description="TPU-native JAX framework for training image GANs "
                "(tartan patterns and beyond).",
    long_description=read("README.md"),
    long_description_content_type="text/markdown",
    license="MIT",
    packages=find_packages(exclude=("tests",)),
    # console-script surface mirrors the reference's setup.py:19-26 plus
    # the additional workloads
    entry_points={
        "console_scripts": [
            "tartangan_scrape = tartangan_tpu.scraper:main",
            "tartangan_train_cnn = tartangan_tpu.train.cnn:main",
            "tartangan_train_iqn = tartangan_tpu.train.iqn:main",
            "tartangan_train_info = tartangan_tpu.train.info:main",
            "tartangan_train_scene = tartangan_tpu.train.scene:main",
            "tartangan_train_text = tartangan_tpu.train.text_cnn:main",
            "tartangan_train_shared_cnn = tartangan_tpu.train.shared.cnn:main",
            "tartangan_train_shared_iqn = tartangan_tpu.train.shared.iqn:main",
            "tartangan_prep_images = tartangan_tpu.data.image_bytes:main",
            "tartangan_inception_moments = tartangan_tpu.eval.moments:main",
            "tartangan_port_inception = tartangan_tpu.eval.port_weights:main",
            "tartangan_export_web = tartangan_tpu.export.web:main",
            "tartangan_serve = tartangan_tpu.serve:main",
            "tartangan_synthetic = tartangan_tpu.data.synthetic:main",
        ]
    },
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "pillow",
        "scipy",
    ],
    python_requires=">=3.10",
)
