"""Interactive control channel for live train/detect runs.

Closes the training_gui interactivity gap (the reference GUI doesn't just
observe — its buttons drive the model while it runs, training_gui.cpp:
149-154): a LiveControl registered with `ImplicitShapeModel.connect`
processes commands BETWEEN stage events, so a run can be paused, stepped
event-by-event, inspected, or aborted from outside the process.

Transports (both feed one code path):

* a JSON command file, polled between events — works over any shared
  filesystem, `echo '{"cmd": "pause"}' > live/control.json`;
* an optional local HTTP endpoint (`serve(port)`), giving browser
  buttons next to the LiveHtmlProgress pages and a `/status` JSON view —
  the headless-idiomatic stand-in for the Qt button row.

Commands:
  pause   — block before the next stage event until resume/step/stop
  resume  — leave paused mode
  step    — while paused: let exactly one stage event through
  stop    — raise StopRequested out of the run (aborts train/detect)
  dump    — write the latest event's summary to <dir>/inspect.json

Usage::

    ctl = LiveControl(os.path.join(out_dir, "control.json"))
    ctl.serve(8137)            # optional: browser buttons
    ism.connect(ctl)           # BEFORE the LiveHtmlProgress callback
    ism.connect(LiveHtmlProgress(out_dir))
    ism.train()                # pausable / steppable / abortable
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Optional

import numpy as np


class StopRequested(RuntimeError):
    """Raised out of the run when a `stop` command arrives."""


_BUTTONS = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>ism control</title>
<style>body{background:#14161a;color:#d8dce2;font:14px system-ui,sans-serif;
padding:24px}button{background:#263238;color:#d8dce2;border:1px solid #4fc3f7;
padding:8px 18px;margin:4px;font-size:14px;cursor:pointer}
#st{color:#9aa3ad;white-space:pre}</style></head><body>
<h2>point_cloud_donkey_tpu &mdash; run control</h2>
<div>
<button onclick="cmd('pause')">pause</button>
<button onclick="cmd('step')">step</button>
<button onclick="cmd('resume')">resume</button>
<button onclick="cmd('dump')">dump</button>
<button onclick="cmd('stop')">stop</button>
</div>
<p id="st">loading status&hellip;</p>
<script>
function cmd(c){fetch('/cmd?c='+c,{method:'POST'});}
async function tick(){try{const r=await fetch('/status');
document.getElementById('st').textContent=
JSON.stringify(await r.json(),null,1);}catch(e){}}
setInterval(tick,1000);tick();
</script></body></html>
"""


class LiveControl:
    """Stage-event callback implementing the command channel.

    Register BEFORE any rendering callback so pause gates the whole event
    fan-out.  Thread-safe: the HTTP thread only enqueues commands; all
    state changes happen on the run's thread inside __call__."""

    COMMANDS = ("pause", "resume", "step", "stop", "dump")

    def __init__(self, control_path: str, poll_s: float = 0.1):
        self.control_path = control_path
        self.poll_s = poll_s
        self.paused = False
        self.n_events = 0
        self.last_event: Optional[str] = None
        self._pending: list = []
        self._lock = threading.Lock()
        self._httpd = None
        d = os.path.dirname(os.path.abspath(control_path))
        os.makedirs(d, exist_ok=True)
        self._status_path = os.path.join(d, "status.json")
        self._inspect_path = os.path.join(d, "inspect.json")

    # -- command intake ------------------------------------------------------
    def push(self, cmd: str) -> None:
        """Enqueue a command programmatically (used by the HTTP thread and
        tests; file commands arrive via _poll_file)."""
        if cmd not in self.COMMANDS:
            raise ValueError(f"unknown command {cmd!r}")
        with self._lock:
            self._pending.append(cmd)

    def _poll_file(self) -> None:
        try:
            with open(self.control_path) as f:
                data = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return
        try:
            os.remove(self.control_path)  # consume exactly once
        except OSError:
            return
        cmds = data if isinstance(data, list) else [data]
        for c in cmds:
            cmd = c.get("cmd") if isinstance(c, dict) else c
            if cmd in self.COMMANDS:
                self.push(cmd)

    def _drain(self) -> list:
        self._poll_file()
        with self._lock:
            out, self._pending = self._pending, []
        return out

    # -- the stage-event gate --------------------------------------------------
    def __call__(self, event: str, payload: dict) -> None:
        self.n_events += 1
        self.last_event = event
        step = False
        while True:
            for cmd in self._drain():
                if cmd == "pause":
                    self.paused = True
                elif cmd == "resume":
                    self.paused = False
                elif cmd == "step":
                    step = True
                elif cmd == "stop":
                    self._write_status(stopping=True)
                    raise StopRequested(
                        f"stop command at event {self.n_events} ({event})")
                elif cmd == "dump":
                    self._write_inspect(event, payload)
            self._write_status()
            if not self.paused or step:
                return
            time.sleep(self.poll_s)

    # -- state files -----------------------------------------------------------
    def _write_status(self, stopping: bool = False) -> None:
        tmp = self._status_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"event": self.last_event, "n_events": self.n_events,
                       "paused": self.paused, "stopping": stopping,
                       "ts": time.time()}, f)
        os.replace(tmp, self._status_path)

    def _write_inspect(self, event: str, payload: dict) -> None:
        def summ(v):
            if isinstance(v, np.ndarray) or hasattr(v, "shape"):
                a = np.asarray(v)
                return {"shape": list(a.shape), "dtype": str(a.dtype),
                        "min": float(np.nanmin(a)) if a.size else None,
                        "max": float(np.nanmax(a)) if a.size else None}
            if isinstance(v, (str, int, float, bool, type(None))):
                return v
            return repr(type(v).__name__)

        with open(self._inspect_path, "w") as f:
            json.dump({"event": event, "n": self.n_events,
                       "payload": {k: summ(v) for k, v in payload.items()}},
                      f, indent=1)

    # -- optional HTTP transport -------------------------------------------------
    def serve(self, port: int, host: str = "127.0.0.1") -> int:
        """Start the browser control endpoint in a daemon thread.  Returns
        the bound port (pass port=0 for an ephemeral one)."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        ctl = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="application/json"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path.startswith("/status"):
                    try:
                        with open(ctl._status_path) as f:
                            self._send(200, f.read())
                    except FileNotFoundError:
                        self._send(200, json.dumps({"event": None}))
                elif self.path.startswith("/inspect"):
                    try:
                        with open(ctl._inspect_path) as f:
                            self._send(200, f.read())
                    except FileNotFoundError:
                        self._send(404, '{"error": "no dump yet"}')
                else:
                    self._send(200, _BUTTONS, "text/html")

            def do_POST(self):
                if self.path.startswith("/cmd"):
                    from urllib.parse import parse_qs, urlparse
                    q = parse_qs(urlparse(self.path).query)
                    cmd = (q.get("c") or [""])[0]
                    if cmd in ctl.COMMANDS:
                        ctl.push(cmd)
                        self._send(200, '{"ok": true}')
                    else:
                        self._send(400, '{"error": "unknown command"}')
                else:
                    self._send(404, '{"error": "not found"}')

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def close(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None
