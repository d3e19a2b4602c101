"""Start the training campaign as soon as the TPU is actually usable.

The axon plugin sometimes degrades to the point where even `jax.devices()`
hangs for minutes (observed round 3). Launching the campaign scheduler in
that state burns its generous per-chunk hard timeouts on hung device init.
This watchdog probes TPU health in a subprocess (so a hang can't wedge the
watchdog itself) and exec's the scheduler once a tiny jit round-trips
quickly; until then it sleeps and retries.

Run:  setsid nohup python tools/tpu_watchdog.py >> /tmp/campaign/watchdog.log 2>&1 < /dev/null &
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
PROBE = (
    "import jax, jax.numpy as jnp, time\n"
    "t0 = time.time()\n"
    "d = jax.devices()\n"
    "assert d[0].platform != 'cpu', d\n"
    "r = jax.jit(lambda x: (x * 2 + 1).sum())(jnp.arange(7.0))\n"
    "r.block_until_ready()\n"
    "print('healthy %.1fs' % (time.time() - t0), flush=True)\n"
)


def tpu_healthy(timeout_s: float = 150.0) -> bool:
    try:
        p = subprocess.run([sys.executable, "-u", "-c", PROBE],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    ok = p.returncode == 0 and "healthy" in p.stdout
    if ok:
        print(time.strftime("%H:%M:%S"), p.stdout.strip(), flush=True)
    return ok


def main():
    while not tpu_healthy():
        print(time.strftime("%H:%M:%S"), "tpu unhealthy; retry in 120s",
              flush=True)
        time.sleep(120)
    print(time.strftime("%H:%M:%S"), "tpu healthy -> exec scheduler",
          flush=True)
    os.execv(sys.executable, [sys.executable,
                              os.path.join(HERE, "campaign_scheduler.py")])


if __name__ == "__main__":
    main()
