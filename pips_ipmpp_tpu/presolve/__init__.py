from pips_ipmpp_tpu.presolve.presolver import Presolver, PresolveResult

__all__ = ["Presolver", "PresolveResult"]
