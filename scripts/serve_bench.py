"""Load benchmark for the continuous-batching serving engine.

Drives `decode/serving.py` with a timed arrival stream at production
shapes and reports throughput plus completion-latency percentiles — the
serving-side counterpart of `bench.py`'s offline batch numbers. Unlike the
offline bench (throughput of one big batch), this measures what a serving
deployment cares about: request latency under concurrency, including queue
wait, across greedy / beam / speculative / quantized configs.

Random-init weights (no trained checkpoints exist in this environment);
latency and throughput are weight-independent, token content is not.

Examples:
  # one chip, 32 greedy slots, int8 slabs, all requests arrive at once
  python scripts/serve_bench.py --n_slots 32 --kv_quant int8 --requests 64

  # beam-5 serving with the reorder-free cache, Poisson arrivals at 2 req/s
  python scripts/serve_bench.py --num_beams 5 --cache_mode ancestry \
      --n_slots 8 --requests 32 --arrival_rps 2

  # CPU smoke test (tiny config)
  JAX_PLATFORMS=cpu python scripts/serve_bench.py --config tiny \
      --requests 8 --n_slots 2 --max_length 12
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np


def percentile(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", default="bart-large", choices=["bart-large", "tiny"])
    p.add_argument("--n_slots", type=int, default=32)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--arrival_rps", type=float, default=0.0,
                   help="Poisson arrival rate (requests/s); 0 = all at t=0")
    p.add_argument("--max_length", type=int, default=142)
    p.add_argument("--min_length", type=int, default=56)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--early_stopping", action="store_true")
    p.add_argument("--cache_mode", default=None,
                   choices=["reorder", "ancestry"],
                   help="beam slot cache (default: engine auto — ancestry "
                        "at num_beams>1, the measured 8.5x winner)")
    p.add_argument("--kv_quant", default=None, choices=["int8", "int4"])
    t_spt = lambda v: v if v == "auto" else int(v)
    p.add_argument("--steps_per_tick", type=t_spt, default=8,
                   help="decode steps per host sync; 'auto' measures the "
                        "tick RTT vs on-device step time and sizes itself")
    p.add_argument("--spec_window", type=int, default=1)
    p.add_argument("--pool_devices", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="pin the JAX platform (e.g. 'cpu' for smoke tests — "
                        "the TPU plugin's sitecustomize rewrites the "
                        "JAX_PLATFORMS env var, so the env alone is not "
                        "enough)")
    p.add_argument("--device_time_probe", type=int, default=0, metavar="N",
                   help="instead of the load bench: fill every slot, then "
                        "separate per-tick DEVICE time from host-link RTT "
                        "by timing N vs 2N dispatched ticks with a single "
                        "sync at the end (dispatch is async, so the "
                        "difference quotient cancels the link cost). The "
                        "serving latency numbers on a tunneled dev chip "
                        "are link-dominated (~0.4 s RTT); this pins the "
                        "engine's own cost separately (VERDICT r4 #8)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from multimodalsum_tpu.core.config import TINY_CONFIG, BartConfig, GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher, EnginePool
    from multimodalsum_tpu.models.bart import BartModel

    if args.config == "tiny":
        cfg = TINY_CONFIG
        shapes = [(2, 8), (1, 4), (2, 6)]
    else:
        cfg = BartConfig(dropout=0.0)
        shapes = [(8, 160), (1, 47), (10, 196)]  # yelp production shapes

    model = BartModel(cfg, multimodal=True, dtype=jnp.bfloat16)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(args.seed),
                        method=BartModel.init_all)["params"]
    print(f"# init {time.time()-t0:.1f}s", flush=True)

    gen = GenerationConfig(
        num_beams=args.num_beams, do_sample=False,
        max_length=args.max_length,
        min_length=min(args.min_length, args.max_length - 2),
        length_penalty=args.length_penalty,
        early_stopping=args.early_stopping, no_repeat_ngram_size=3)

    kw = dict(kv_quant=args.kv_quant, steps_per_tick=args.steps_per_tick,
              cache_mode=args.cache_mode)
    if args.spec_window > 1:
        kw.update(spec_window=args.spec_window,
                  spec_src_max=shapes[0][0] * shapes[0][1])
    if args.pool_devices == 1:
        eng = ContinuousBatcher(model, params, gen, args.n_slots, shapes, **kw)
    else:
        devices = jax.local_devices()
        if args.pool_devices > 0:
            devices = devices[: args.pool_devices]
        eng = EnginePool(model, params, gen, args.n_slots, shapes,
                         devices=devices, **kw)

    rng = np.random.default_rng(args.seed)
    d = cfg.d_model
    # one shared buffer per modality, sliced per request (host RAM is the
    # constraint at bart-large shapes, not realism: K/V projections differ
    # per request anyway through the random offsets below)
    base = [rng.normal(size=(e, s, d)).astype(np.float32) for e, s in shapes]
    masks = [np.ones((e, s), bool) for e, s in shapes]
    src = rng.integers(3, cfg.vocab_size, base[0].shape[:2]).astype(np.int32)

    if args.arrival_rps > 0:
        gaps = rng.exponential(1.0 / args.arrival_rps, args.requests)
        arrivals = np.cumsum(gaps)
        arrivals[0] = 0.0
    else:
        arrivals = np.zeros(args.requests)

    # warm-up: compile the step/insert/project programs outside the
    # measured window (one request through the engine)
    t0 = time.time()
    eng.submit("warmup", [h * 0.9 for h in base], masks,
               source_tokens=src if args.spec_window > 1 else None)
    eng.run()
    print(f"# warmup (compile) {time.time()-t0:.1f}s", flush=True)

    if args.device_time_probe:
        if args.pool_devices != 1:
            raise SystemExit("--device_time_probe is single-engine only")
        # the probe never collects, so finished slots cannot refill — the
        # whole 2 + N + 2N tick budget must fit inside one request's decode
        # (otherwise the later window runs emptier, cheaper ticks and the
        # difference quotient goes negative). Clamp N accordingly.
        spt_now = eng.steps_per_tick if isinstance(eng.steps_per_tick, int) else 1
        N = min(args.device_time_probe,
                max(1, (args.max_length // spt_now - 3) // 3))
        if N < args.device_time_probe:
            print(f"# probe: N clamped {args.device_time_probe} -> {N} "
                  f"(budget {args.max_length // spt_now} ticks at "
                  f"steps_per_tick={spt_now}; use --steps_per_tick 1 for "
                  f"finer windows)", flush=True)
        # fill every slot (fresh requests)
        for i in range(args.n_slots):
            scale = 0.8 + 0.4 * rng.random()
            eng.submit(f"p{i}", [h * scale for h in base], masks,
                       source_tokens=src if args.spec_window > 1 else None)

        def timed_ticks(k):
            t0 = time.perf_counter()
            for _ in range(k):
                eng._dispatch()
            np.asarray(eng.state.cur_len[:1])  # the only reliable barrier
            return time.perf_counter() - t0

        timed_ticks(2)  # steady-state warm (fills + first real steps)
        t_n, t_2n = timed_ticks(N), timed_ticks(2 * N)
        # T(k) = k*step_device + link; difference quotient cancels link
        step_dev = (t_2n - t_n) / N
        link = max(t_n - N * step_dev, 0.0)
        spt = eng.steps_per_tick
        out = {
            "bench": "serving_device_time",
            "config": {k: v for k, v in vars(args).items()},
            "ticks_timed": [N, 2 * N],
            "wall_per_tick_s": round(t_n / N, 4),
            "device_per_tick_s": round(step_dev, 4),
            "device_per_decode_step_s": round(step_dev / spt, 4),
            "link_overhead_per_sync_s": round(link, 4),
            "device_fraction": round(step_dev / (t_n / N), 4),
        }
        print(json.dumps(out), flush=True)
        return

    lat, done_t, tokens_out = {}, {}, {}
    sub_t = {}
    t0 = time.time()
    nxt = 0
    while nxt < args.requests or eng.pending:
        now = time.time() - t0
        while nxt < args.requests and arrivals[nxt] <= now:
            rid = f"r{nxt}"
            scale = 0.8 + 0.4 * rng.random()
            eng.submit(rid, [h * scale for h in base], masks,
                       source_tokens=src if args.spec_window > 1 else None)
            sub_t[rid] = time.time()
            nxt += 1
        for rid, toks, n in eng.tick():
            if rid == "warmup":
                continue
            done_t[rid] = time.time()
            lat[rid] = done_t[rid] - sub_t[rid]
            tokens_out[rid] = n
        if nxt < args.requests and not eng.pending:
            time.sleep(min(0.01, max(0.0, arrivals[nxt] - (time.time() - t0))))
    wall = time.time() - t0

    ls = sorted(lat.values())
    total_tokens = int(sum(tokens_out.values()))
    out = {
        "bench": "serving",
        "config": {k: v for k, v in vars(args).items()},
        "wall_s": round(wall, 3),
        "req_per_s": round(args.requests / wall, 3),
        "tok_per_s": round(total_tokens / wall, 1),
        "latency_s": {"p50": round(percentile(ls, 50), 3),
                      "p90": round(percentile(ls, 90), 3),
                      "p99": round(percentile(ls, 99), 3),
                      "max": round(max(ls), 3) if ls else None},
        "mean_tokens": round(total_tokens / max(len(tokens_out), 1), 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
