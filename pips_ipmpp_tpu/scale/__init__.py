from pips_ipmpp_tpu.scale.scaling import (CurtisReidScaler, EquilibriumScaler,
                                          GeometricMeanScaler, make_scaler)

__all__ = ["GeometricMeanScaler", "EquilibriumScaler", "CurtisReidScaler",
           "make_scaler"]
