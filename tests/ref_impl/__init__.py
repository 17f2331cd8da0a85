"""Independent numpy float64 oracle implementations of the reference math.

These are written directly from the published equations / observed semantics of
the C++ reference (cited per-function) and serve as the golden comparison for
the JAX kernels. They deliberately share no code with the package under test.
"""
