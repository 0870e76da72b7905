from setuptools import Extension, setup

setup(
    name="panvc3-native",
    ext_modules=[
        Extension(
            "_panvc3_native",
            sources=["panvc3_native.c", "fastpath.c", "bgzf.c", "csr.c",
                     "als.c"],
            libraries=["z"],
            # -ffp-contract=off: the extended-P² estimator (als.c) must
            # round exactly like the Python float64 oracle; -march=native
            # would otherwise contract its mul+add chains into FMAs
            extra_compile_args=["-O3", "-march=native", "-pthread",
                                "-ffp-contract=off"],
            extra_link_args=["-pthread"],
        )
    ],
)
