"""amcx — TPU-native least-squares Monte Carlo (American Monte Carlo).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CPU/NumPy pricer `heidi123123/american-monte-carlo`: GBM path
simulation, Longstaff-Schwartz backward induction with on-device polynomial
regression, European/American vanilla and down-and-in barrier options, CCR
exposure profiles, a self-hosted analytic + binomial oracle, pathwise Greeks,
variance reduction, multi-asset Bermudan max-calls, and data-parallel path
sharding over TPU meshes.
"""

from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig
from .paths import simulate_gbm, simulate_gbm_multi, to_path_major
from .payoff import intrinsic_value, barrier_knocked, max_call_payoff
from .basis import design_matrix, multi_asset_design_matrix
from .regress import regression_fitted_values, fit_continuation
from .engine import (LSMCResult, backward_induction, lsmc_option_pricing,
                     price_option, q0_call_advisory)
from .oracle import (
    bs_price,
    bs_greeks,
    down_in_price,
    barrier_price,
    crr_price,
    crr_down_in_price,
    crr_barrier_price,
    oracle_price,
    implied_vol,
    american_implied_vol,
)
from .boundary import exercise_boundary
from .policy import (reprice_with_coeffs, price_out_of_sample, OOSResult,
                     valuation_interval, ValuationInterval)
from .term import (TermCurves, price_option_curves, simulate_gbm_curves,
                   european_price_curves, crr_price_curves)
from .swing import (price_swing_option, price_swing_option_curves,
                    crr_swing_price, price_swing_contract,
                    SwingContractResult)
from .hybrid import (HullWhiteParams, price_option_hw, european_price_hw,
                     simulate_hybrid_hw)
from .dual import dual_upper_bound, dual_upper_bound_max_call, DualResult
from .exposures import (compute_ccr_exposures, CCRExposures,
                        exposures_from_coeffs, cva_from_epe, bilateral_cva)
from .analytics import compute_differences, oracle_grid_values
from .engine_pallas import lsmc_option_pricing_fused
from .greeks import price_and_greeks, gamma_fd, fast_greeks
from .variates import (control_variate_price, ControlVariateResult,
                       martingale_control_variate,
                       importance_sampled_european)
from .models.maxcall import price_max_call, max_call_greeks
from .book import (price_strike_grid, price_mixed_book, BookResult,
                   book_ccr_exposures, book_greeks)
from .models.asian import (price_asian_option, geometric_asian_price,
                           running_average)
from .rates import (HW1FParams, bond_price_hw, simulate_hw_rates,
                    swap_schedule, jamshidian_swaption_price,
                    price_bermudan_swaption, pde_bermudan_swaption,
                    swaption_ccr_profile)
from .models.lookback import (price_lookback_option, running_max,
                              running_min, lookback_fixed_call_cont,
                              lookback_fixed_put_cont,
                              lookback_floating_put_cont,
                              lookback_floating_call_cont)
from .models.basket import (price_basket_option, geometric_basket_price,
                            basket_level, basket_greeks,
                            price_exchange_option, margrabe_price,
                            price_spread_option, kirk_price)
from .dynamics import (HestonParams, simulate_heston, simulate_local_vol,
                       heston_price_cf, price_option_heston,
                       price_option_local_vol, MertonJumps, simulate_merton,
                       merton_price, price_option_merton,
                       simulate_bates, bates_price_cf, price_option_bates,
                       VGParams, simulate_vg, vg_price_cf, price_option_vg,
                       NIGParams, simulate_nig, nig_price_cf,
                       price_option_nig)
from .deep import (DeepSpec, deep_backward_induction, deep_price_option,
                   deep_price_max_call, deep_dual_bound)
from .qmc import simulate_gbm_qmc, simulate_gbm_multi_qmc, sobol_normals
from .scenarios import ScenarioGrid, scenario_ladder
from .calibrate import (SVISurface, fit_svi_surface, fit_svi_slice,
                        svi_total_variance, dupire_local_vol,
                        calibrate_heston, implied_vol_np)
from .pde import (PDEGrid, PDEResult, pde_price, pde_price_ladder,
                  pde_greeks, tridiag_solve)

__version__ = "0.1.0"

__all__ = [
    "MarketParams",
    "ProductSpec",
    "RegressionSpec",
    "SimConfig",
    "simulate_gbm",
    "simulate_gbm_multi",
    "to_path_major",
    "intrinsic_value",
    "barrier_knocked",
    "max_call_payoff",
    "design_matrix",
    "multi_asset_design_matrix",
    "regression_fitted_values",
    "fit_continuation",
    "LSMCResult",
    "backward_induction",
    "lsmc_option_pricing",
    "price_option",
    "bs_price",
    "bs_greeks",
    "down_in_price",
    "barrier_price",
    "crr_barrier_price",
    "crr_price",
    "crr_down_in_price",
    "oracle_price",
    "implied_vol",
    "american_implied_vol",
    "exercise_boundary",
    "reprice_with_coeffs",
    "price_out_of_sample",
    "OOSResult",
    "valuation_interval",
    "ValuationInterval",
    "TermCurves",
    "price_option_curves",
    "simulate_gbm_curves",
    "european_price_curves",
    "crr_price_curves",
    "price_swing_option",
    "price_swing_option_curves",
    "price_swing_contract",
    "SwingContractResult",
    "crr_swing_price",
    "HullWhiteParams",
    "price_option_hw",
    "european_price_hw",
    "simulate_hybrid_hw",
    "dual_upper_bound",
    "dual_upper_bound_max_call",
    "DualResult",
    "compute_ccr_exposures",
    "exposures_from_coeffs",
    "cva_from_epe",
    "bilateral_cva",
    "q0_call_advisory",
    "CCRExposures",
    "compute_differences",
    "oracle_grid_values",
    "lsmc_option_pricing_fused",
    "price_and_greeks",
    "gamma_fd",
    "fast_greeks",
    "control_variate_price",
    "martingale_control_variate",
    "importance_sampled_european",
    "ControlVariateResult",
    "price_max_call",
    "max_call_greeks",
    "price_strike_grid",
    "price_mixed_book",
    "book_ccr_exposures",
    "book_greeks",
    "price_asian_option",
    "geometric_asian_price",
    "running_average",
    "HestonParams",
    "simulate_heston",
    "simulate_local_vol",
    "heston_price_cf",
    "price_option_heston",
    "price_option_local_vol",
    "MertonJumps",
    "simulate_merton",
    "merton_price",
    "price_option_merton",
    "simulate_bates",
    "bates_price_cf",
    "price_option_bates",
    "VGParams",
    "simulate_vg",
    "vg_price_cf",
    "price_option_vg",
    "NIGParams",
    "simulate_nig",
    "nig_price_cf",
    "price_option_nig",
    "DeepSpec",
    "deep_backward_induction",
    "deep_price_option",
    "deep_price_max_call",
    "deep_dual_bound",
    "BookResult",
    "simulate_gbm_qmc",
    "simulate_gbm_multi_qmc",
    "sobol_normals",
    "HW1FParams",
    "bond_price_hw",
    "simulate_hw_rates",
    "swap_schedule",
    "jamshidian_swaption_price",
    "price_bermudan_swaption",
    "pde_bermudan_swaption",
    "swaption_ccr_profile",
    "price_lookback_option",
    "running_max",
    "running_min",
    "lookback_fixed_call_cont",
    "lookback_fixed_put_cont",
    "lookback_floating_put_cont",
    "lookback_floating_call_cont",
    "price_basket_option",
    "geometric_basket_price",
    "basket_level",
    "basket_greeks",
    "price_exchange_option",
    "margrabe_price",
    "price_spread_option",
    "kirk_price",
    "SVISurface",
    "fit_svi_surface",
    "fit_svi_slice",
    "svi_total_variance",
    "dupire_local_vol",
    "calibrate_heston",
    "implied_vol_np",
    "ScenarioGrid",
    "scenario_ladder",
    "PDEGrid",
    "PDEResult",
    "pde_price",
    "pde_price_ladder",
    "pde_greeks",
    "tridiag_solve",
]
