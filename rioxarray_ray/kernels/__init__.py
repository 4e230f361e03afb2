"""Pure-numpy geospatial kernels. No Ray imports anywhere in this subpackage."""
