// amcx native oracle: double-precision benchmark engines in C++.
//
// Role parity with the reference's only native component — QuantLib's C++
// pricing engines accessed via SWIG (/root/reference/american_monte_carlo.py:
// 10-68): analytic Black-Scholes-Merton, Reiner-Rubinstein down-and-in
// barrier, and Cox-Ross-Rubinstein binomial trees (vanilla + down-and-in,
// European + American). The JAX oracle (amcx/oracle.py) runs the same
// engines on-device in float32; this library is the independent float64
// cross-check, loaded via ctypes (amcx/native_oracle.py).
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kInvSqrt2 = 0.7071067811865475244;

double norm_cdf(double x) { return 0.5 * std::erfc(-x * kInvSqrt2); }

double phi_of(int is_put) { return is_put ? -1.0 : 1.0; }

double bs_price_impl(double S0, double K, double T, double r, double sigma,
                     double q, int is_put) {
  const double phi = phi_of(is_put);
  const double sig = std::max(sigma * std::sqrt(T), 1e-16);
  const double d1 =
      (std::log(S0 / K) + (r - q + 0.5 * sigma * sigma) * T) / sig;
  const double d2 = d1 - sig;
  return phi * (S0 * std::exp(-q * T) * norm_cdf(phi * d1) -
                K * std::exp(-r * T) * norm_cdf(phi * d2));
}

// Reiner-Rubinstein down-and-in (rebate 0, continuous monitoring, H < S0).
double down_in_impl(double S0, double K, double T, double r, double sigma,
                    double H, double q, int is_put) {
  if (S0 <= H) return bs_price_impl(S0, K, T, r, sigma, q, is_put);
  const double phi = phi_of(is_put);
  const double eta = 1.0;  // down barrier
  const double b = r - q;
  const double sig = std::max(sigma * std::sqrt(T), 1e-16);
  const double mu = (b - 0.5 * sigma * sigma) / (sigma * sigma);

  const double x1 = std::log(S0 / K) / sig + (1.0 + mu) * sig;
  const double x2 = std::log(S0 / H) / sig + (1.0 + mu) * sig;
  const double y1 = std::log(H * H / (S0 * K)) / sig + (1.0 + mu) * sig;
  const double y2 = std::log(H / S0) / sig + (1.0 + mu) * sig;

  const double ebrt = std::exp((b - r) * T);
  const double ert = std::exp(-r * T);
  const double hs = H / S0;
  const double pow1 = std::pow(hs, 2.0 * (mu + 1.0));
  const double pow2 = std::pow(hs, 2.0 * mu);

  auto plain = [&](double z) {
    return phi * (S0 * ebrt * norm_cdf(phi * z) -
                  K * ert * norm_cdf(phi * z - phi * sig));
  };
  auto reflected = [&](double z) {
    return phi * (S0 * ebrt * pow1 * norm_cdf(eta * z) -
                  K * ert * pow2 * norm_cdf(eta * z - eta * sig));
  };

  const double A = plain(x1), B = plain(x2), C = reflected(y1),
               D = reflected(y2);
  double price;
  if (!is_put) {
    price = (K >= H) ? C : (A - B + D);
  } else {
    price = (K >= H) ? (B - C + D) : A;
  }
  return std::max(price, 0.0);
}

// CRR binomial; when H > 0, prices the down-and-in claim via the joint
// vanilla/knock-in backward recursion (knocked node -> vanilla value, no
// early exercise above the barrier: the same semantics the LSMC engine and
// the JAX oracle enforce).
double crr_impl(double S0, double K, double T, double r, double sigma,
                double q, int n, int is_put, int american, double H) {
  const double phi = phi_of(is_put);
  const double dt = T / n;
  const double u = std::exp(sigma * std::sqrt(dt));
  const double d = 1.0 / u;
  const double a = std::exp((r - q) * dt);
  const double p = (a - d) / (u - d);
  const double disc = std::exp(-r * dt);
  const bool barrier = H > 0.0;

  std::vector<double> spot(n + 1), van(n + 1), di;
  if (barrier) di.resize(n + 1);
  for (int j = 0; j <= n; ++j) {
    spot[j] = S0 * std::exp((2.0 * j - n) * sigma * std::sqrt(dt));
    van[j] = std::max(phi * (spot[j] - K), 0.0);
    if (barrier) di[j] = (spot[j] <= H) ? van[j] : 0.0;
  }
  for (int level = n - 1; level >= 0; --level) {
    for (int j = 0; j <= level; ++j) {
      const double S = S0 * std::exp((2.0 * j - level) * sigma * std::sqrt(dt));
      van[j] = disc * (p * van[j + 1] + (1.0 - p) * van[j]);
      if (barrier) di[j] = disc * (p * di[j + 1] + (1.0 - p) * di[j]);
      if (american) {
        van[j] = std::max(van[j], std::max(phi * (S - K), 0.0));
      }
      if (barrier && S <= H) di[j] = van[j];
    }
  }
  return barrier ? di[0] : van[0];
}

}  // namespace

// Swing (multiple-stopping) rights lattice: the float64 C++ twin of
// amcx.swing.crr_swing_price — n_rights value vectors rolled back jointly
// on a CRR tree whose exercise dates sit at multiples of n_sub (exactly
// the LSMC grid); payoff_forward=1 pays the SIGNED phi*(S-K) per take and
// n_min take-or-pay obligations force exercise when the remaining dates
// run out. Independent cross-check for both the numpy lattice and the
// LSMC engines (tests/test_native_oracle.py).
double swing_impl(double S0, double K, double T, double r, double sigma,
                  double q, int n_rights, int n_steps, int n_sub, int is_put,
                  int payoff_forward, int n_min) {
  const int N = n_steps * n_sub;
  const double ddt = T / N;
  const double u = std::exp(sigma * std::sqrt(ddt));
  const double d = 1.0 / u;
  const double p = (std::exp((r - q) * ddt) - d) / (u - d);
  const double df = std::exp(-r * ddt);
  const double phi = phi_of(is_put);
  auto take = [&](int step, int j) {
    const double S = S0 * std::exp((2.0 * j - step) * sigma * std::sqrt(ddt));
    const double signed_pay = phi * (S - K);
    return payoff_forward ? signed_pay : std::max(signed_pay, 0.0);
  };
  auto obligations = [&](int k) { return std::max(0, n_min - (n_rights - k)); };
  // V[k][j]: value with k rights remaining at node j of the current level
  std::vector<std::vector<double>> V(
      n_rights + 1, std::vector<double>(N + 1, 0.0));
  for (int j = 0; j <= N; ++j) {
    const double ex = take(N, j);
    for (int k = 1; k <= n_rights; ++k) {
      // exactly one take at the maturity date, forced or optional
      V[k][j] = obligations(k) >= 1 ? ex : std::max(ex, 0.0);
    }
  }
  for (int step = N - 1; step >= 0; --step) {
    for (int k = 0; k <= n_rights; ++k) {
      for (int j = 0; j <= step; ++j) {
        V[k][j] = df * (p * V[k][j + 1] + (1.0 - p) * V[k][j]);
      }
    }
    if (step % n_sub == 0) {
      const int dates_remaining = n_steps - step / n_sub + 1;
      for (int j = 0; j <= step; ++j) {
        const double ex = take(step, j);
        for (int k = n_rights; k >= 1; --k) {  // descending: V[k-1] pre-update
          if (obligations(k) >= dates_remaining) {
            V[k][j] = ex + V[k - 1][j];
          } else {
            V[k][j] = std::max(V[k][j], ex + V[k - 1][j]);
          }
        }
      }
    }
  }
  return V[n_rights][0];
}

extern "C" {

double amcx_bs_price(double S0, double K, double T, double r, double sigma,
                     double q, int is_put) {
  return bs_price_impl(S0, K, T, r, sigma, q, is_put);
}

double amcx_down_in_price(double S0, double K, double T, double r,
                          double sigma, double barrier, double q, int is_put) {
  return down_in_impl(S0, K, T, r, sigma, barrier, q, is_put);
}

double amcx_crr_price(double S0, double K, double T, double r, double sigma,
                      double q, int n_steps, int is_put, int american) {
  return crr_impl(S0, K, T, r, sigma, q, n_steps, is_put, american, 0.0);
}

double amcx_crr_down_in_price(double S0, double K, double T, double r,
                              double sigma, double barrier, double q,
                              int n_steps, int is_put, int american) {
  return crr_impl(S0, K, T, r, sigma, q, n_steps, is_put, american, barrier);
}

// Batched grid evaluator: the C++ analogue of compute_quantlib_values
// (american_monte_carlo.py:385-396) — price a fresh option of maturity
// tau[i] at spot S[i] for every grid point.
void amcx_bs_price_batch(const double* S, const double* tau, int64_t n,
                         double K, double r, double sigma, double q,
                         int is_put, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = bs_price_impl(S[i], K, std::max(tau[i], 1e-12), r, sigma, q, is_put);
  }
}

void amcx_crr_price_batch(const double* S, const double* tau, int64_t n,
                          double K, double r, double sigma, double q,
                          int n_steps, int is_put, int american, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = crr_impl(S[i], K, std::max(tau[i], 1e-12), r, sigma, q, n_steps,
                      is_put, american, 0.0);
  }
}

double amcx_swing_price(double S0, double K, double T, double r,
                        double sigma, double q, int n_rights, int n_steps,
                        int n_sub, int is_put, int payoff_forward,
                        int n_min) {
  return swing_impl(S0, K, T, r, sigma, q, n_rights, n_steps, n_sub, is_put,
                    payoff_forward, n_min);
}

}  // extern "C"
