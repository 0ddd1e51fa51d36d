"""HTTP file-serving frontend.

Serves the same virtual filesystem the FUSE mount exposes, but over
plain HTTP — usable where no kernel FUSE is available (containers), and
directly by network media players.  Routes:

    /                         -> status page (+ /settings?f=)
    /files/<path>             -> convolved file bytes (Range supported)
    /ls/<path>                -> directory listing (text)

No peer in the reference (its only HTTP is the status page); this is a
frontend over the same ``FolveVfs`` operations the FUSE layer uses.
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from folve_tpu.server.vfs import FolveVfs

_CHUNK = 64 << 10


def make_httpfs_server(vfs: FolveVfs, port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            path = urllib.parse.unquote(parsed.path)
            try:
                if path.startswith("/files/"):
                    self._serve_file("/" + path[len("/files/") :])
                elif path.startswith("/ls"):
                    self._serve_listing(path[len("/ls") :] or "/")
                elif vfs.status_server is not None:
                    code, headers, body = vfs.status_server.handle_http(self.path)
                    self._reply(code, headers, body)
                else:
                    self._reply(404, {}, b"not found")
            except OSError as e:
                self._reply(404, {}, f"error: {e}".encode())

        def _reply(self, code, headers, body):
            self.send_response(code)
            for k, v in headers.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _serve_listing(self, path):
            entries = vfs.readdir(path)
            body = ("\n".join(entries) + "\n").encode()
            self._reply(200, {"Content-Type": "text/plain"}, body)

        def _serve_file(self, path):
            handler = vfs.open(path)
            try:
                st = vfs.getattr(path, handler)
                start, end = 0, None
                rng = self.headers.get("Range")
                status = 200
                if rng and rng.startswith("bytes="):
                    spec = rng[6:].split("-")
                    start = int(spec[0]) if spec[0] else 0
                    end = int(spec[1]) if len(spec) > 1 and spec[1] else None
                    status = 206
                self.send_response(status)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Accept-Ranges", "bytes")
                if status == 206:
                    self.send_header(
                        "Content-Range",
                        f"bytes {start}-{(end if end is not None else st.st_size - 1)}"
                        f"/{st.st_size}",
                    )
                # Sizes are estimates (the reference inflates them too);
                # stream chunked so we can stop at the true end.
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                offset = start
                remaining = None if end is None else end - start + 1
                while True:
                    want = _CHUNK if remaining is None else min(_CHUNK, remaining)
                    if want <= 0:
                        break
                    data = vfs.read(handler, want, offset)
                    if not data:
                        break
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")
                    offset += len(data)
                    if remaining is not None:
                        remaining -= len(data)
                self.wfile.write(b"0\r\n\r\n")
            finally:
                vfs.release(path, handler)

    return ThreadingHTTPServer(("", port), Handler)


def serve_http_files(vfs: FolveVfs, port: int) -> int:
    httpd = make_httpfs_server(vfs, port)
    print(f"serving files on http://localhost:{httpd.server_address[1]}/files/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def start_httpfs_thread(vfs: FolveVfs, port: int = 0) -> ThreadingHTTPServer:
    """Background variant for tests/embedding."""
    httpd = make_httpfs_server(vfs, port)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
