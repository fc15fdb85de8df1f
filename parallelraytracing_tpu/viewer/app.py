"""Interactive progressive viewer.

The analogue of the reference's application layer (src/main.cpp): a frame
loop that polls input, integrates the orbit camera, clears the film on
camera movement (main.cpp:506-511), renders one progressive sample, and
displays it — with engine radio-select (main.cpp:476-485) and live
per-stage timing (main.cpp:265-462).

Headless TPU hosts have no OpenGL, so the window is a browser page served
by a stdlib HTTP server: the client drags/wheels the camera (the
GLFW-input analogue, main.cpp:204-263), the server streams the film's
tonemapped PNG.  Zero third-party dependencies.

Run:  python -m parallelraytracing_tpu.viewer.app --scene cornell --port 7860
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!DOCTYPE html>
<html><head><title>parallelraytracing_tpu viewer</title>
<style>
 body { background:#14171c; color:#cfd8e3; font-family:monospace; margin:0; }
 #wrap { display:flex; }
 #img { image-rendering:pixelated; cursor:grab; }
 #panel { padding:12px; min-width:260px; }
 .stat { margin:2px 0; }
 label { display:block; margin:2px 0; }
</style></head>
<body><div id="wrap">
<img id="img" width="__W__" height="__H__"/>
<div id="panel">
 <h3>parallelraytracing_tpu</h3>
 <div id="engines"></div>
 <hr/>
 <div class="stat">frame: <span id="frame">0</span></div>
 <div class="stat">samples: <span id="samples">0</span></div>
 <div class="stat">render ms: <span id="ms">0</span></div>
 <div class="stat">fps: <span id="fps">0</span></div>
 <hr/>
 <div>drag: orbit &middot; shift-drag: pan &middot; wheel: zoom</div>
</div></div>
<script>
const img = document.getElementById('img');
let dragging = false, lastX = 0, lastY = 0, shift = false;
img.onmousedown = e => { dragging = true; lastX = e.clientX; lastY = e.clientY; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  const dx = e.clientX - lastX, dy = e.clientY - lastY;
  lastX = e.clientX; lastY = e.clientY;
  const kind = e.shiftKey ? 'translate' : 'rotate';
  fetch('/control', {method:'POST', body: JSON.stringify({kind, dx, dy})});
};
img.onwheel = e => {
  e.preventDefault();
  fetch('/control', {method:'POST',
    body: JSON.stringify({kind:'zoom', dy: e.deltaY})});
};
async function poll() {
  try {
    const s = await (await fetch('/stats')).json();
    document.getElementById('frame').textContent = s.frame;
    document.getElementById('samples').textContent = s.samples;
    document.getElementById('ms').textContent = s.render_ms.toFixed(1);
    document.getElementById('fps').textContent = s.fps.toFixed(1);
    const eng = document.getElementById('engines');
    if (!eng.childElementCount) {
      for (const name of s.engines) {
        const l = document.createElement('label');
        l.innerHTML = `<input type="radio" name="engine" value="${name}"` +
          (name === s.engine ? ' checked' : '') + `/> ${name}`;
        l.firstChild.onchange = () => fetch('/control',
          {method:'POST', body: JSON.stringify({kind:'engine', name})});
        eng.appendChild(l);
      }
    }
    img.src = '/frame.png?f=' + s.frame;
  } catch (err) {}
  setTimeout(poll, 250);
}
poll();
</script></body></html>
"""


class ViewerState:
    """Shared state between the render loop and the HTTP handlers."""

    def __init__(self, scene, camera, cfg, engine_name: str):
        import jax

        from parallelraytracing_tpu import Film, available_engines, create_renderer

        self.jax = jax
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.film = Film(cfg.width, cfg.height)
        self.engines = available_engines()
        self.engine_name = engine_name
        self.renderer = create_renderer(engine_name)
        self.renderer.init(self.film, scene, camera, cfg)
        self.lock = threading.Lock()
        self.camera_dirty = False
        self.switch_to = None
        self.render_ms = 0.0
        self.fps = 0.0
        self.frame = 0
        self.png_cache = b""
        self.stop = False

    # ------------------------------------------------- input (HTTP thread)
    def control(self, msg: dict) -> None:
        with self.lock:
            kind = msg.get("kind")
            if kind == "rotate":
                # pixels -> degrees, reference feel (main.cpp input scale)
                self.camera.rotate(-0.25 * msg.get("dy", 0),
                                   -0.25 * msg.get("dx", 0))
            elif kind == "translate":
                self.camera.translate(-0.02 * msg.get("dx", 0),
                                      0.02 * msg.get("dy", 0))
            elif kind == "zoom":
                self.camera.zoom(-0.01 * msg.get("dy", 0))
            elif kind == "engine" and msg.get("name") in self.engines:
                self.switch_to = msg["name"]

    # ---------------------------------------------------- frame loop (main)
    def run(self) -> None:
        from parallelraytracing_tpu import create_renderer
        from parallelraytracing_tpu.utils.png import write_png
        import numpy as np

        last = time.time()
        while not self.stop:
            now = time.time()
            dt = min(now - last, 0.1)
            last = now

            with self.lock:
                moved = self.camera.update(dt if dt > 0 else 0.016)
                switch = self.switch_to
                self.switch_to = None

            if switch:
                # engine radio-select clears the film (main.cpp:476-485)
                self.engine_name = switch
                self.renderer = create_renderer(switch)
                self.renderer.init(self.film, self.scene, self.camera, self.cfg)
                self.film.clear()
            if moved:
                # camera move -> SetCamera + film.Clear (main.cpp:506-511)
                self.renderer.set_camera(self.camera)
                self.film.clear()
                self.renderer.reset_progressive()

            t0 = time.perf_counter()
            self.renderer.progressive_render()
            from parallelraytracing_tpu.utils.sync import device_sync
            device_sync(self.film.accum)
            self.render_ms = (time.perf_counter() - t0) * 1e3
            self.fps = 1.0 / max(time.perf_counter() - t0, 1e-9)
            self.frame += 1

            self.png_cache = _png_bytes(self.film.display_numpy())


def _png_bytes(img) -> bytes:
    import struct
    import zlib

    import numpy as np

    h, w, c = img.shape

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 6 if c == 4 else 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
            + chunk(b"IDAT", zlib.compress(raw, 1)) + chunk(b"IEND", b""))


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                page = _PAGE.replace("__W__", str(state.cfg.width)) \
                            .replace("__H__", str(state.cfg.height))
                self._send(200, "text/html", page.encode())
            elif self.path.startswith("/frame.png"):
                self._send(200, "image/png", state.png_cache or b"")
            elif self.path.startswith("/stats"):
                body = json.dumps({
                    "frame": state.frame,
                    "samples": state.film.sample_count,
                    "render_ms": state.render_ms,
                    "fps": state.fps,
                    "engine": state.engine_name,
                    "engines": state.engines,
                }).encode()
                self._send(200, "application/json", body)
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            if self.path.startswith("/control"):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    msg = {}
                state.control(msg)
                self._send(200, "application/json", b"{}")
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="interactive viewer")
    p.add_argument("--scene", default="material_test")
    p.add_argument("--engine", default="bvh")
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--depth", type=int, default=10)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.depth, seed=0)
    scene = Scene(ScenePreset(args.scene))
    cam = default_camera(args.width, args.height)
    state = ViewerState(scene, cam, cfg, args.engine)

    server = ThreadingHTTPServer(("127.0.0.1", args.port),
                                 make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"viewer on http://127.0.0.1:{args.port}  "
          f"(scene={args.scene}, engine={args.engine})")
    try:
        state.run()
    except KeyboardInterrupt:
        pass
    finally:
        state.stop = True
        server.shutdown()
    return 0


if __name__ == "__main__":
    main()
