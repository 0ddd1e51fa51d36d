"""FUSE transport tests.

The native session speaks the raw /dev/fuse protocol on any fd, so the
protocol layer is tested over a SOCK_SEQPACKET socketpair with
hand-packed kernel requests (linux/fuse.h ABI 7.x).  A real kernel
mount is attempted opportunistically and skipped where the environment
forbids it.
"""

import errno
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from folve_tpu.fuse.mount import FuseSession
from folve_tpu.server.status import StatusServer
from folve_tpu.server.vfs import FolveVfs

from tests.test_runtime import echo_ir, expected_conv, make_fs, write_song

# linux/fuse.h opcodes
FUSE_LOOKUP = 1
FUSE_GETATTR = 3
FUSE_READLINK = 5
FUSE_OPEN = 14
FUSE_READ = 15
FUSE_RELEASE = 18
FUSE_INIT = 26
FUSE_OPENDIR = 27
FUSE_READDIR = 28
FUSE_RELEASEDIR = 29

ROOT_ID = 1

IN_HDR = struct.Struct("<IIQQIIII")  # len opcode unique nodeid uid gid pid pad
OUT_HDR = struct.Struct("<IiQ")  # len error unique
ATTR = struct.Struct("<QQQQQQIIIIIIIIII")  # 88 bytes (7.9+ layout)


class FuseHarness:
    """Drives a FuseSession through a socketpair like the kernel would."""

    def __init__(self, vfs):
        self.kernel_sock, session_sock = socket.socketpair(
            socket.AF_UNIX, socket.SOCK_SEQPACKET
        )
        self.session = FuseSession(vfs)
        # Hand the raw fd to the native loop; keep python obj alive.
        self._session_sock = session_sock
        self.session.set_fd(session_sock.fileno())
        self.unique = 0
        self.thread = threading.Thread(
            target=self.session.loop, kwargs=dict(num_threads=1), daemon=True
        )
        self.thread.start()
        self.init()

    def request(self, opcode, nodeid, payload=b"", want_reply=True):
        self.unique += 1
        msg = IN_HDR.pack(
            IN_HDR.size + len(payload), opcode, self.unique, nodeid, 0, 0, 0, 0
        ) + payload
        self.kernel_sock.send(msg)
        if not want_reply:
            return None, None
        reply = self.kernel_sock.recv(1 << 20)
        length, error, unique = OUT_HDR.unpack_from(reply)
        assert unique == self.unique
        return error, reply[OUT_HDR.size : length]

    def init(self):
        payload = struct.pack("<IIII", 7, 38, 65536, 0) + bytes(48)
        err, body = self.request(FUSE_INIT, 0, payload)
        assert err == 0
        major, minor = struct.unpack_from("<II", body)
        assert major == 7

    def lookup(self, parent, name: str):
        err, body = self.request(FUSE_LOOKUP, parent, name.encode() + b"\0")
        if err != 0:
            return err, None, None
        nodeid, gen, ev, av, evn, avn = struct.unpack_from("<QQQQII", body)
        attr = ATTR.unpack_from(body, 40)
        return 0, nodeid, attr

    def getattr(self, nodeid, fh=None):
        # fuse_getattr_in: getattr_flags u32, dummy u32, fh u64.
        FUSE_GETATTR_FH = 1
        payload = struct.pack(
            "<IIQ", FUSE_GETATTR_FH if fh is not None else 0, 0, fh or 0
        )
        err, body = self.request(FUSE_GETATTR, nodeid, payload)
        if err:
            return err, None
        attr = ATTR.unpack_from(body, 16)
        return 0, attr

    def open(self, nodeid, flags=os.O_RDONLY):
        err, body = self.request(FUSE_OPEN, nodeid, struct.pack("<II", flags, 0))
        if err:
            return err, None, None
        fh, open_flags, _ = struct.unpack_from("<QII", body)
        return 0, fh, open_flags

    def read(self, nodeid, fh, offset, size):
        payload = struct.pack("<QQIIQII", fh, offset, size, 0, 0, 0, 0)
        err, body = self.request(FUSE_READ, nodeid, payload)
        return err, body

    def release(self, nodeid, fh):
        payload = struct.pack("<QIIQ", fh, 0, 0, 0)
        return self.request(FUSE_RELEASE, nodeid, payload)

    def readdir_names(self, nodeid):
        err, body = self.request(FUSE_OPENDIR, nodeid, struct.pack("<II", 0, 0))
        assert err == 0
        fh, _, _ = struct.unpack_from("<QII", body)
        names = []
        offset = 0
        while True:
            payload = struct.pack("<QQIIQII", fh, offset, 8192, 0, 0, 0, 0)
            err, body = self.request(FUSE_READDIR, nodeid, payload)
            assert err == 0
            if not body:
                break
            pos = 0
            while pos < len(body):
                ino, off, namelen, dtype = struct.unpack_from("<QQII", body, pos)
                name = body[pos + 24 : pos + 24 + namelen].decode()
                names.append(name)
                pos += (24 + namelen + 7) & ~7
                offset = off
        self.request(FUSE_RELEASEDIR, nodeid, struct.pack("<QIIQ", fh, 0, 0, 0))
        return names

    def close(self):
        # Orderly shutdown: FUSE_DESTROY makes the worker exit before we
        # close fds (otherwise a blocked read() would race the next
        # test's reused fd numbers).
        try:
            self.request(38, 0)  # FUSE_DESTROY
        except OSError:
            pass
        self.thread.join(timeout=5)
        self.kernel_sock.close()
        self._session_sock.close()


@pytest.fixture
def harness(tmp_path):
    fs, src = make_fs(tmp_path)
    write_song(src, "song.flac", 1500)
    (src / "notes.txt").write_bytes(b"plain")
    status = StatusServer(fs)
    vfs = FolveVfs(fs, status_server=status)
    h = FuseHarness(vfs)
    yield h, fs, src
    h.close()


class TestProtocol:
    def test_lookup_and_getattr(self, harness):
        h, fs, src = harness
        err, nodeid, attr = h.lookup(ROOT_ID, "song.flac")
        assert err == 0
        size = attr[1]
        real = os.stat(src / "song.flac").st_size
        assert size == int(real * fs.file_oversize_factor)
        err, attr2 = h.getattr(nodeid)
        assert err == 0 and attr2[1] == size

    def test_lookup_missing(self, harness):
        h, fs, src = harness
        err, _, _ = h.lookup(ROOT_ID, "missing.flac")
        assert err == -errno.ENOENT

    def test_readdir(self, harness):
        h, fs, src = harness
        names = h.readdir_names(ROOT_ID)
        assert "song.flac" in names
        assert "folve-status.html" in names

    def test_open_read_convolved(self, harness):
        h, fs, src = harness
        err, nodeid, _ = h.lookup(ROOT_ID, "song.flac")
        err, fh, open_flags = h.open(nodeid)
        assert err == 0
        assert open_flags & 0x1  # FOPEN_DIRECT_IO
        blob = b""
        while True:
            err, chunk = h.read(nodeid, fh, len(blob), 65536)
            assert err == 0
            if not chunk:
                break
            blob += chunk
        h.release(nodeid, fh)
        assert blob[:4] == b"fLaC"
        from folve_tpu.audio.flac import read_flac

        got, info = read_flac(blob)
        assert info.frames == 1500

    def test_write_open_fails_erofs(self, harness):
        """Write-access opens are refused at FUSE_OPEN (read-only by
        design); this rides the socketpair transport so the kernel's
        own MS_RDONLY check cannot mask the filesystem's behavior."""
        h, fs, src = harness
        err, nodeid, _ = h.lookup(ROOT_ID, "song.flac")
        assert err == 0
        for flags in (os.O_WRONLY, os.O_RDWR):
            err, _, _ = h.open(nodeid, flags)
            assert err == -errno.EROFS, (flags, err)
        # read-only still fine afterwards
        err, fh, _ = h.open(nodeid)
        assert err == 0
        h.release(nodeid, fh)

    def test_getattr_fh_uses_open_handler(self, harness):
        """FUSE_GETATTR with FUSE_GETATTR_FH (fstat on an open file)
        stats the LIVE handler behind the fh.  Discriminating scenario:
        after a filter switch the path-based lookup no longer resolves
        this handler (cache key = filter + path, folve-filesystem.cc:
        91-94), so only genuine fh plumbing can still return its
        monotone size estimate."""
        h, fs, src = harness
        err, nodeid, _ = h.lookup(ROOT_ID, "song.flac")
        assert err == 0
        err, fh, _ = h.open(nodeid)
        assert err == 0
        off = 0
        while True:
            err, chunk = h.read(nodeid, fh, off, 65536)
            assert err == 0
            if not chunk:
                break
            off += len(chunk)
        err, attr_fh = h.getattr(nodeid, fh=fh)
        assert err == 0
        # Switch to pass-through: path-based stats now return the RAW
        # source size, while the open fh must keep reporting the
        # convolving handler's estimate.
        fs.switch_current_config_dir("")
        err, attr_path = h.getattr(nodeid)
        err2, attr_fh2 = h.getattr(nodeid, fh=fh)
        assert err == 0 and err2 == 0
        assert attr_fh2[1] == attr_fh[1]  # still the handler's estimate
        # path-based: raw source size with the VFS's suffix inflation
        assert attr_path[1] == int(
            os.stat(src / "song.flac").st_size * fs.file_oversize_factor
        )
        assert attr_fh2[1] != attr_path[1]
        h.release(nodeid, fh)

    def test_status_file_over_protocol(self, harness):
        h, fs, src = harness
        err, nodeid, attr = h.lookup(ROOT_ID, "folve-status.html")
        assert err == 0
        err, fh, _ = h.open(nodeid)
        err, body = h.read(nodeid, fh, 0, attr[1])
        assert b"Folve-TPU" in body
        h.release(nodeid, fh)


def test_parse_mount_options():
    from folve_tpu.fuse.mount import parse_mount_options

    p = parse_mount_options("")
    assert (p.extra, p.writable) == ("", False)
    p = parse_mount_options("ro")
    assert (p.extra, p.writable) == ("", False)
    p = parse_mount_options("allow_other")
    assert (p.extra, p.writable) == ("allow_other", False)
    p = parse_mount_options("allow_other,rw,default_permissions")
    assert (p.extra, p.writable) == ("allow_other,default_permissions", True)
    # Unknown options are ignored (warned), like the reference's
    # pass-through of unrecognized -o flags to libfuse.
    p = parse_mount_options("nosuchopt,ro")
    assert (p.extra, p.writable) == ("", False)
    # fsname / subtype / max_read reach the kernel mount
    # (folve-main.cc:499-514 forwards the whole -o namespace).
    p = parse_mount_options("fsname=mysrc,subtype=folve,max_read=65536")
    assert p.fsname == "mysrc" and p.subtype == "folve"
    assert p.max_read == 65536
    # sanitization: mount-data injection via commas/controls is stripped
    p = parse_mount_options("fsname=e$(vil)`x`")
    assert p.fsname == "evilx"
    p = parse_mount_options("max_read=nonsense")
    assert p.max_read == 0
    p = parse_mount_options("max_read=1")
    assert p.max_read == 4096  # clamped to sane floor


@pytest.mark.skipif(not os.path.exists("/dev/fuse"), reason="no /dev/fuse")
class TestRealMount:
    def test_kernel_mount_with_options(self, tmp_path):
        """-o allow_other,rw reaches the kernel mount (visible in
        /proc/mounts)."""
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 400)
        vfs = FolveVfs(fs, status_server=StatusServer(fs))
        mnt = tmp_path / "mnt"
        mnt.mkdir()
        session = FuseSession(vfs)
        try:
            session.mount(str(mnt), options="allow_other,rw")
        except OSError as e:
            pytest.skip(f"mount not permitted here: {e}")
        t = threading.Thread(target=session.loop, daemon=True)
        t.start()
        try:
            with open("/proc/mounts") as f:
                line = next(l for l in f if str(mnt) in l)
            assert "allow_other" in line
            assert line.split()[3].startswith("rw")
        finally:
            session.unmount()

    def test_kernel_mount(self, tmp_path):
        fs, src = make_fs(tmp_path)
        x = write_song(src, "song.flac", 1200)
        status = StatusServer(fs)
        vfs = FolveVfs(fs, status_server=status)
        mnt = tmp_path / "mnt"
        mnt.mkdir()
        session = FuseSession(vfs)
        try:
            session.mount(str(mnt))
        except OSError as e:
            pytest.skip(f"mount not permitted here: {e}")
        t = threading.Thread(target=session.loop, daemon=True)
        t.start()
        try:
            deadline = time.time() + 10
            names = []
            while time.time() < deadline:
                names = os.listdir(mnt)
                if names:
                    break
                time.sleep(0.1)
            assert "song.flac" in names
            with open(mnt / "song.flac", "rb") as f:
                blob = f.read()
            from folve_tpu.audio.flac import read_flac

            got, _ = read_flac(blob)
            ref = expected_conv(x, echo_ir())
            assert np.max(np.abs(got - ref)) < 2.5 / 32768
        finally:
            session.unmount()

    def test_kernel_mount_symlink_and_odd_names(self, tmp_path):
        """readlink over a real kernel mount (the c_char_p callback bug
        made every readlink fail with garbage), plus a non-UTF-8
        filename surviving listing + open (os.fsencode round-trip)."""
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 600)
        os.symlink("song.flac", src / "link.flac")
        odd = os.fsdecode(b"caf\xe9.txt")  # latin-1 name, invalid UTF-8
        with open(src / odd, "wb") as f:
            f.write(b"odd name payload")
        status = StatusServer(fs)
        vfs = FolveVfs(fs, status_server=status)
        mnt = tmp_path / "mnt"
        mnt.mkdir()
        session = FuseSession(vfs)
        try:
            session.mount(str(mnt))
        except OSError as e:
            pytest.skip(f"mount not permitted here: {e}")
        t = threading.Thread(target=session.loop, daemon=True)
        t.start()
        try:
            deadline = time.time() + 10
            names = []
            while time.time() < deadline:
                names = os.listdir(mnt)
                if len(names) >= 3:
                    break
                time.sleep(0.1)
            assert "link.flac" in names
            assert odd in names, names
            assert os.readlink(mnt / "link.flac") == "song.flac"
            with open(mnt / odd, "rb") as f:
                assert f.read() == b"odd name payload"
            # Write-access opens fail up front with EROFS.
            with pytest.raises(OSError) as ei:
                os.open(mnt / "song.flac", os.O_WRONLY)
            assert ei.value.errno in (errno.EROFS, errno.EACCES)
            # fstat() on an OPEN file reports the handler's exact
            # (current) size, not only the path-based estimate.
            fd = os.open(mnt / "song.flac", os.O_RDONLY)
            try:
                st = os.fstat(fd)
                assert st.st_size > 0
            finally:
                os.close(fd)
        finally:
            session.unmount()
