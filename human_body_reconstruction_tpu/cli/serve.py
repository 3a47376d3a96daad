"""Persistent rendering server — the production serving surface.

docs/PERF_NOTES.md "AOT executable cache": even with compilation fully
cached, a FRESH process pays ~2 minutes of checkpoint + executable
upload through the remote-TPU tunnel at flagship scale, so
latency-sensitive serving must keep one long-lived process.  This CLI
is that process: restore the checkpoint once, optionally pre-warm the
render executable, then serve render requests until EOF/shutdown.
(The reference has no serving surface at all — novel views only fall
out of the training script's periodic renders, train_hash2.py:271-298.)

Two transports, both dependency-free:
  (default)   JSON-lines on stdin/stdout: one request object per line,
              one response object per line.  Composes with any process
              manager, socket bridge, or subprocess harness.
  --port N    minimal HTTP server (stdlib http.server):
                POST /render '{...}'  -> response JSON
                GET  /health          -> {"ok": true, ...stats}

Request fields (all optional unless marked):
  c2w             [[4x4]] camera-to-world matrix (REQUIRED unless orbit)
  orbit           {"index": 0, "count": 12, "radius": 4.0,
                   "elevation": 0.5} — synthesized turntable pose
  height, width   image size (default: server flags)
  camera_angle_x  horizontal FoV (default: server flag)
  num_samples     samples/ray (default: server flag)
  eval_guided     deterministic guided sample budget (0 = exact ladder;
                  needs --use_occ; 2.5x cheaper at 48, -0.09 dB)
  out_path        write the PNG here; otherwise the response carries
                  image_b64 (base64 PNG)
  no_image        true -> timing probe, response carries no image
  id              opaque, echoed back
  batch           true -> prerender a POSE BATCH in one fused dispatch
                  (amortises the ~35 ms/dispatch tunnel floor over the
                  whole batch): poses from "c2ws" [[4x4], ...] or every
                  pose of "orbit" {count, radius, elevation}; output to
                  "out_dir" (frame_%04d.png) or "images_b64" list.
                  Always uses the fused render path.
  cmd             "health" -> stats, "quit" -> shut the server down

Response: {"ok": true, "id":..., "wall_s":..., "rays_per_sec":...,
           "H":..., "W":..., "path" | "image_b64":...}
          {"ok": false, "error": "..."} on a bad request (the server
          stays up — one malformed request must not kill serving).

Run:  python -m human_body_reconstruction_tpu.cli.serve \
          --ckpt_dir results --model_name flagship --use_occ \
          --eval_guided 48 --aot_cache /tmp/hbr_aot --warmup
"""

from __future__ import annotations

import argparse
import base64
import dataclasses
import io
import json
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        description="Persistent novel-view render server (TPU-native)")
    # run directory / model identity (shared with cli/render.py)
    p.add_argument("--ckpt_dir", type=str, default="results")
    p.add_argument("--model_name", type=str, default="default")
    p.add_argument("--bound_pth", type=str, default="bounds_model.npy")
    p.add_argument("--ckpt_name", type=str, default="N_2048_T_16")
    p.add_argument("--use_sdf", action="store_true")
    p.add_argument("--max_res", type=float, default=2048)
    p.add_argument("--hash_size", type=float, default=16)
    p.add_argument("--encoder_variant", type=str, default=None,
                   choices=["corner", "cell", "cp"])
    p.add_argument("--rgb_elu", action="store_true")
    p.add_argument("--normalization", type=str, default=None,
                   choices=["diagonal", "unit_box"])
    # render defaults (overridable per request)
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    p.add_argument("--num_samples", type=int, default=128)
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--use_occ", action="store_true",
                   help="reuse the trained occupancy grid for culling "
                        "and guided placement")
    p.add_argument("--eval_guided", type=int, default=0,
                   help="default deterministic guided sample budget "
                        "(requires --use_occ); requests may override")
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--camera_angle_x", type=float, default=0.6911112)
    p.add_argument("--aot_cache", type=str, default="",
                   help="disk-backed compiled-executable cache dir")
    p.add_argument("--fp32", action="store_true",
                   help="render in float32 compute (default is bfloat16, "
                        "matching the training step; measured-exactness "
                        "knob for serving A/Bs)")
    p.add_argument("--no_fused", action="store_true",
                   help="per-chunk dispatch (render_image) instead of the "
                        "one-dispatch whole-frame render_image_fused; the "
                        "fused path saves ~35 ms of tunnel latency per "
                        "chunk here")
    p.add_argument("--warmup", action="store_true",
                   help="render one default-size view at startup so the "
                        "first request never pays compile/upload latency")
    # transport
    p.add_argument("--port", type=int, default=0,
                   help="serve HTTP on this port instead of stdin/stdout")
    return p


class RenderServer:
    """Checkpoint restored once; renders on demand; tracks stats."""

    def __init__(self, args):
        import jax  # noqa: F401  (device init before first request)

        from human_body_reconstruction_tpu.pipeline import restore
        from human_body_reconstruction_tpu.train import step as step_lib

        self.args = args
        self.step_lib = step_lib
        res = restore.restore(
            args.ckpt_dir, args.model_name, bound_pth=args.bound_pth,
            ckpt_name=args.ckpt_name, near=args.near, far=args.far,
            use_sdf=args.use_sdf, max_res=args.max_res,
            hash_size=args.hash_size, encoder_variant=args.encoder_variant,
            rgb_elu=args.rgb_elu, normalization=args.normalization,
            with_occ=args.use_occ,
            # stdout carries ONLY response JSON lines in stdio mode
            log_fn=lambda s: print(s, file=sys.stderr, flush=True))
        self.params, self.scene, self.occ = res.params, res.scene, res.occ
        self.base_cfg = res.cfg
        if args.eval_guided > 0 and self.occ is None:
            raise SystemExit("--eval_guided needs the trained occupancy "
                             "grid: pass --use_occ (and train with "
                             "occupancy enabled)")
        self.render_fn = None
        cache_dir = args.aot_cache or os.environ.get("HBR_AOT_CACHE")
        if cache_dir:
            from human_body_reconstruction_tpu.utils import aot

            self.render_fn = aot.CachedJit(
                step_lib.render_chunk, aot.AOTCache(cache_dir),
                static_argnames=("cfg", "num_samples", "hierarchical"))
        self.n_served = 0
        self.rays_served = 0
        self.render_s = 0.0
        self.t_up = time.perf_counter()

    def _cfg_for(self, guided: int):
        if guided > 0 and self.occ is None:
            raise ValueError("eval_guided needs a trained occupancy grid "
                             "(serve with --use_occ)")
        return dataclasses.replace(
            self.base_cfg, render=dataclasses.replace(
                self.base_cfg.render, eval_guided=max(guided, 0)))

    def _pose_from(self, req):
        import numpy as np

        if "c2w" in req:
            c2w = np.asarray(req["c2w"], np.float32)
            if c2w.shape != (4, 4):
                raise ValueError(f"c2w must be 4x4, got {c2w.shape}")
            return c2w
        if "orbit" in req:
            from human_body_reconstruction_tpu.data import synthetic

            o = dict(req["orbit"])
            poses = synthetic.orbit_poses(
                int(o.get("count", 12)),
                radius=float(o.get("radius", 4.0)),
                elevation=float(o.get("elevation", 0.5)))
            return np.asarray(poses[int(o.get("index", 0))], np.float32)
        raise ValueError("request needs 'c2w' (4x4) or 'orbit' "
                         "{index, count, ...}")

    def _poses_from(self, req):
        """Batch request -> (P, 4, 4) pose stack: either an explicit
        'c2ws' list or an 'orbit' whose EVERY pose is rendered."""
        import numpy as np

        if "c2ws" in req:
            poses = np.asarray(req["c2ws"], np.float32)
            if poses.ndim != 3 or poses.shape[1:] != (4, 4):
                raise ValueError(f"c2ws must be (P, 4, 4), got {poses.shape}")
            return poses
        if "orbit" in req:
            from human_body_reconstruction_tpu.data import synthetic

            o = dict(req["orbit"])
            return np.asarray(synthetic.orbit_poses(
                int(o.get("count", 12)),
                radius=float(o.get("radius", 4.0)),
                elevation=float(o.get("elevation", 0.5))), np.float32)
        raise ValueError("batch request needs 'c2ws' [(4x4), ...] or "
                         "'orbit' {count, ...}")

    def render_batch(self, req: dict) -> dict:
        """Prerender a pose batch (turntable orbit / pose stack) in ONE
        fused dispatch — through the remote tunnel a dispatch + sync
        costs ~35 ms, so an N-frame orbit as N single-frame requests
        pays N floors; this endpoint pays one (train/step.py
        render_poses_fused).  Request: {"batch": true, "orbit": {...} |
        "c2ws": [...], "out_dir": ... | nothing -> images_b64 list}."""
        import numpy as np
        import jax.numpy as jnp
        from PIL import Image

        a = self.args
        poses = self._poses_from(req)
        H = int(req.get("height", a.height))
        W = int(req.get("width", a.width))
        cax = float(req.get("camera_angle_x", a.camera_angle_x))
        S = int(req.get("num_samples", a.num_samples))
        guided = int(req.get("eval_guided", a.eval_guided))
        focal = W / (2.0 * np.tan(cax / 2.0))
        K = jnp.asarray([[focal, 0, W / 2.0], [0, focal, H / 2.0],
                         [0, 0, 1]], jnp.float32)
        t0 = time.perf_counter()
        imgs = np.asarray(self.step_lib.render_poses_fused(
            self.params, self.scene, H, W, K, jnp.asarray(poses),
            self._cfg_for(guided), occ=self.occ, num_samples=S,
            chunk=min(a.chunk, poses.shape[0] * H * W),
            bf16=not a.fp32))
        wall = time.perf_counter() - t0
        P = poses.shape[0]
        self.n_served += P
        self.rays_served += P * H * W
        self.render_s += wall
        resp = {"ok": True, "H": H, "W": W, "frames": P,
                "num_samples": S, "eval_guided": guided,
                "wall_s": round(wall, 3),
                "rays_per_sec": round(P * H * W / max(wall, 1e-9), 1)}
        if "id" in req:
            resp["id"] = req["id"]
        if req.get("no_image"):
            return resp
        arr8 = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
        if req.get("out_dir"):
            out_dir = str(req["out_dir"])
            os.makedirs(out_dir, exist_ok=True)
            paths = []
            for i in range(P):
                path = os.path.join(out_dir, f"frame_{i:04d}.png")
                Image.fromarray(arr8[i]).save(path)
                paths.append(path)
            resp["paths"] = paths
        else:
            b64 = []
            for i in range(P):
                buf = io.BytesIO()
                Image.fromarray(arr8[i]).save(buf, format="PNG")
                b64.append(base64.b64encode(buf.getvalue()).decode())
            resp["images_b64"] = b64
        return resp

    def render(self, req: dict) -> dict:
        import numpy as np
        import jax.numpy as jnp
        from PIL import Image

        a = self.args
        c2w = self._pose_from(req)
        H = int(req.get("height", a.height))
        W = int(req.get("width", a.width))
        cax = float(req.get("camera_angle_x", a.camera_angle_x))
        S = int(req.get("num_samples", a.num_samples))
        guided = int(req.get("eval_guided", a.eval_guided))
        focal = W / (2.0 * np.tan(cax / 2.0))
        K = jnp.asarray([[focal, 0, W / 2.0], [0, focal, H / 2.0],
                         [0, 0, 1]], jnp.float32)
        t0 = time.perf_counter()
        if a.no_fused or self.render_fn is not None:
            img = self.step_lib.render_image(
                self.params, self.scene, H, W, K, jnp.asarray(c2w),
                self._cfg_for(guided), occ=self.occ, num_samples=S,
                chunk=min(a.chunk, H * W), render_fn=self.render_fn)
        else:
            img = np.asarray(self.step_lib.render_image_fused(
                self.params, self.scene, H, W, K, jnp.asarray(c2w),
                self._cfg_for(guided), occ=self.occ, num_samples=S,
                chunk=min(a.chunk, H * W), bf16=not a.fp32))
        wall = time.perf_counter() - t0
        self.n_served += 1
        self.rays_served += H * W
        self.render_s += wall
        arr8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        pil = Image.fromarray(arr8)
        resp = {"ok": True, "H": H, "W": W, "num_samples": S,
                "eval_guided": guided, "wall_s": round(wall, 3),
                "rays_per_sec": round(H * W / max(wall, 1e-9), 1)}
        if "id" in req:
            resp["id"] = req["id"]
        if req.get("no_image"):
            pass                      # timing/warmup probe: no payload
        elif req.get("out_path"):
            path = str(req["out_path"])
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            pil.save(path)
            resp["path"] = path
        else:
            buf = io.BytesIO()
            pil.save(buf, format="PNG")
            resp["image_b64"] = base64.b64encode(buf.getvalue()).decode()
        return resp

    def health(self) -> dict:
        h = {"ok": True, "model_name": self.args.model_name,
             "uptime_s": round(time.perf_counter() - self.t_up, 1),
             "served": self.n_served, "rays_served": self.rays_served,
             "render_s_total": round(self.render_s, 2),
             "use_occ": self.occ is not None,
             "default_eval_guided": self.args.eval_guided}
        if self.render_fn is not None:
            h["aot_cache"] = self.render_fn.cache.stats()
        return h

    def handle(self, req: dict) -> dict:
        """One request -> one response; never raises on bad input."""
        try:
            cmd = req.get("cmd")
            if cmd == "health":
                return self.health()
            if cmd == "quit":
                return {"ok": True, "bye": True}
            if req.get("batch"):
                return self.render_batch(req)
            return self.render(req)
        except Exception as e:  # noqa: BLE001 — server must stay up
            r = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            if isinstance(req, dict) and "id" in req:
                r["id"] = req["id"]
            return r


def serve_stdio(server: RenderServer):
    """JSON-lines loop: one request per stdin line, one response per
    stdout line.  Logs go to stderr so stdout stays machine-parseable."""
    print(f"ready model={server.args.model_name} "
          f"occ={server.occ is not None}", file=sys.stderr, flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  flush=True)
            continue
        resp = server.handle(req)
        print(json.dumps(resp), flush=True)
        if resp.get("bye"):
            break


def serve_http(server: RenderServer, port: int):
    """Minimal stdlib HTTP front-end.  Single-threaded by design: the
    device serializes renders anyway, and one queue keeps tail latency
    honest."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health"):
                self._send(200, server.health())
            else:
                self._send(404, {"ok": False, "error": "GET /health only"})

        def do_POST(self):
            if self.path.rstrip("/") != "/render":
                self._send(404, {"ok": False,
                                 "error": "POST /render only"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"ok": False, "error": f"bad json: {e}"})
                return
            resp = server.handle(req)
            self._send(200 if resp.get("ok") else 400, resp)
            if resp.get("bye"):
                raise KeyboardInterrupt

        def log_message(self, fmt, *args):  # stderr, not stdout
            print("http: " + fmt % args, file=sys.stderr, flush=True)

    httpd = HTTPServer(("127.0.0.1", port), Handler)
    print(f"ready http://127.0.0.1:{httpd.server_port}/render "
          f"model={server.args.model_name}", file=sys.stderr, flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def main(argv=None):
    args = build_parser().parse_args(argv)
    server = RenderServer(args)
    if args.warmup:
        t0 = time.perf_counter()
        server.handle({"orbit": {"index": 0, "count": 8},
                       "no_image": True})
        print(f"warmup render {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    if args.port:
        serve_http(server, args.port)
    else:
        serve_stdio(server)
    return server


if __name__ == "__main__":
    main()
