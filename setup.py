import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "newmsm_tpu.native._geometry",
            sources=["newmsm_tpu/native/_geometry.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-fopenmp"],
            extra_link_args=["-fopenmp"],
            optional=True,   # pure-Python fallbacks exist
        )
    ]
)
