from . import arith, ntt
