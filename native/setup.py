from setuptools import Extension, setup

setup(
    name="panvc3-native",
    ext_modules=[
        Extension(
            "_panvc3_native",
            sources=["panvc3_native.c", "fastpath.c", "bgzf.c", "csr.c",
                     "als.c"],
            libraries=["z"],
            extra_compile_args=["-O3", "-march=native", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
)
