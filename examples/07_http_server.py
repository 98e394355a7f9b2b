"""Dev HTTP server streaming LZ4-compressed responses.

Reference counterpart: examples/web/lz4.web-server.js (a zero-dependency
HTTP/2 static server that generates /sample.lz4 through the compress stream,
:114-141). This one serves any file LZ4-compressed on the fly and accepts
compressed uploads on POST /upload.

    python examples/07_http_server.py [port]
    curl localhost:8654/README.md | python -m divortio_lz4_tpu decompress /dev/stdin -o -
"""

import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import divortio_lz4_tpu as lz4

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class LZ4Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        path = os.path.normpath(os.path.join(ROOT, self.path.lstrip("/")))
        if not path.startswith(ROOT) or not os.path.isfile(path):
            self.send_error(404)
            return
        stream = lz4.CompressStream(lz4.FrameConfig(block_size=65536,
                                                    content_checksum=True))
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("X-Content-Encoding", "lz4-frame")
        self.end_headers()
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 16)
                if not chunk:
                    break
                out = stream.write(chunk)
                if out:
                    self.wfile.write(out)
        self.wfile.write(stream.flush())

    def do_POST(self):
        if self.path != "/upload":
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        plain = bytes(lz4.decompress(body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(f"received {len(body)} compressed / "
                         f"{len(plain)} plain bytes\n".encode())

    def log_message(self, fmt, *args):
        print(f"[lz4-server] {fmt % args}", file=sys.stderr)


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8654
    print(f"serving {ROOT} LZ4-compressed on :{port}", file=sys.stderr)
    HTTPServer(("127.0.0.1", port), LZ4Handler).serve_forever()
