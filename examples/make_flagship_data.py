"""Generate the pinned flagship dataset `data/flagship.csv`.

The reference's actual deliverable is two backtests on ^GSPC/^IXIC
adjusted closes 2009-04-15 -> 2015-10-12 downloaded via yfinance
(`/root/reference/main.py:23-75`, `data_loader/load_data.py:59-66`).
This build environment has no network, and the reference repo ships no
data files, so the flagship configuration is pinned against a
DETERMINISTIC SYNTHETIC STAND-IN with the same schema and shape:

  * 1,636 business-day adjusted closes from 2009-04-15 (-> 1,635 daily
    log-returns x 100: N = 1135 in-sample + T = 500 out-of-sample days,
    the reference's `main.py:25-33` split);
  * two large-cap-index-like series (upward drift ~0.05%/day, daily vol
    ~1-1.3%, GARCH(1,1) volatility clustering with different (alpha,
    beta) per asset, cross-correlation ~0.9 via a common factor — the
    empirical profile of S&P 500 / NASDAQ over that window).

Deterministic: seeded PRNG, pure numpy. Re-running this script must
reproduce `data/flagship.csv` byte-for-byte (asserted by the flagship
test when the file exists).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_PRICES = 1636  # -> 1635 returns = 1135 in-sample + 500 out-of-sample
START = "2009-04-15"
COLUMNS = ("GSPC_SYN", "IXIC_SYN")


def flagship_prices():
    rng = np.random.default_rng(20090415)
    n = N_PRICES - 1
    # common + idiosyncratic gaussian factors: corr ~ 0.9
    z_c = rng.standard_normal(n)
    z_i = rng.standard_normal((2, n))
    lam = np.sqrt(0.9)
    eps = lam * z_c[None, :] + np.sqrt(1.0 - lam**2) * z_i

    params = [  # omega, alpha, beta, mu (returns in x100 units)
        (0.020, 0.085, 0.895, 0.045),   # GSPC-like: vol ~1.0%
        (0.030, 0.095, 0.885, 0.055),   # IXIC-like: vol ~1.25%
    ]
    rets = np.zeros((2, n))
    for a, (om, al, be, mu) in enumerate(params):
        var = om / (1.0 - al - be)
        r2_prev, v_prev = var, var
        for t in range(n):
            v = om + al * r2_prev + be * v_prev
            r = np.sqrt(v) * eps[a, t]
            rets[a, t] = mu + r
            r2_prev, v_prev = r * r, v
    prices = 100.0 * np.exp(np.cumsum(
        np.concatenate([np.zeros((2, 1)), rets / 100.0], axis=1), axis=1
    ))
    return prices.T  # (N_PRICES, 2)


def main(path="data/flagship.csv"):
    import pandas as pd

    prices = flagship_prices()
    dates = pd.bdate_range(START, periods=N_PRICES)
    df = pd.DataFrame(
        {"date": dates.strftime("%Y-%m-%d"),
         COLUMNS[0]: np.round(prices[:, 0], 6),
         COLUMNS[1]: np.round(prices[:, 1], 6)}
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.to_csv(path, index=False)
    rets = np.log(prices[1:] / prices[:-1]) * 100.0
    print(f"wrote {path}: {len(df)} rows")
    print(f"  daily ret mean {rets.mean(axis=0).round(4)} "
          f"std {rets.std(axis=0).round(3)} "
          f"corr {np.corrcoef(rets.T)[0, 1]:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
