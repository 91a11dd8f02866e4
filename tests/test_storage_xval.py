"""S3T cross-validation against the actual reference implementation.

Compiles tiny C++ programs against the read-only reference headers
(/root/reference) to (a) write a file our reader must load bit-exactly,
and (b) read back + checksum-verify a file our writer produced.  Skipped
when the reference tree or a C++ toolchain is unavailable.  This is the
strongest possible format-compatibility evidence short of running the
reference's own test suite.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from superbblas_tpu import storage as S

REF = "/root/reference/include"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("g++")),
    reason="reference headers or g++ unavailable",
)

WRITER = r"""
#include "superbblas.h"
#include <vector>
#include <iostream>
using namespace superbblas;
int main() {
    constexpr std::size_t Nd = 2;
    Coor<Nd> dim{4, 6};
    Storage_handle sto;
    create_storage<Nd, double>(dim, SlowToFast, "OUT", "meta!", 5,
                               BlockChecksum, &sto);
    std::vector<PartitionItem<Nd>> blocks(2);
    blocks[0][0] = Coor<Nd>{0, 0}; blocks[0][1] = Coor<Nd>{4, 3};
    blocks[1][0] = Coor<Nd>{0, 3}; blocks[1][1] = Coor<Nd>{4, 3};
    append_blocks<Nd, double>(blocks.data(), 2, dim, sto, SlowToFast);
    std::vector<double> v(24);
    for (int i = 0; i < 24; ++i) v[i] = i * 1.5;
    Context ctx = createCpuContext();
    std::vector<PartitionItem<Nd>> p(1);
    p[0][0] = Coor<Nd>{0, 0}; p[0][1] = dim;
    const double *ptr = v.data();
    save<Nd, Nd, double, double>(1.0, p.data(), 1, "xy", Coor<Nd>{0, 0}, dim,
                                 dim, (const double **)&ptr, &ctx, "xy",
                                 Coor<Nd>{0, 0}, sto, SlowToFast);
    close_storage<Nd, double>(sto);
    return 0;
}
"""

READER = r"""
#include "superbblas.h"
#include <vector>
#include <cstdio>
using namespace superbblas;
int main() {
    constexpr std::size_t Nd = 2;
    values_datatype vt;
    std::vector<char> metadata; std::vector<IndexType> size;
    read_storage_header("OUT", SlowToFast, vt, metadata, size);
    if (size.size() != 2 || size[0] != 4 || size[1] != 6) return 2;
    if (vt != DOUBLE) return 4;
    if (std::string(metadata.begin(), metadata.end()) != "meta!") return 5;
    Storage_handle sto;
    open_storage<Nd, double>("OUT", false, &sto);
    check_storage<Nd, double>(sto);   // verify our block CRCs
    Context ctx = createCpuContext();
    std::vector<PartitionItem<Nd>> p(1);
    p[0][0] = Coor<Nd>{0, 0}; p[0][1] = Coor<Nd>{4, 6};
    std::vector<double> v(24, 0.0);
    double *ptr = v.data();
    load<Nd, Nd, double, double>(1.0, sto, "xy", Coor<Nd>{0, 0},
                                 Coor<Nd>{4, 6}, p.data(), 1, "xy",
                                 Coor<Nd>{0, 0}, Coor<Nd>{4, 6}, &ptr, &ctx,
                                 SlowToFast, Copy);
    close_storage<Nd, double>(sto);
    for (int i = 0; i < 24; ++i)
        if (v[i] != i * 1.5) { std::printf("bad %d\n", i); return 3; }
    std::printf("ok\n");
    return 0;
}
"""


def _compile(tmp_path, name, code, out_file):
    src = tmp_path / f"{name}.cpp"
    src.write_text(code.replace("OUT", str(out_file)))
    exe = tmp_path / name
    subprocess.run(
        ["g++", "-O1", "-std=c++14", f"-I{REF}", str(src), "-o", str(exe)],
        check=True, capture_output=True, timeout=300,
    )
    return exe


def test_reference_writes_we_read(tmp_path):
    f = tmp_path / "ref.s3t"
    exe = _compile(tmp_path, "writer", WRITER, f)
    subprocess.run([str(exe)], check=True, timeout=60)

    sto = S.open_storage(str(f), mode="r")
    assert sto.dim == (4, 6)
    assert sto.metadata == "meta!"
    assert sto.checksum_level == 2
    assert len(sto.blocks) == 2
    y = S.load(1.0, sto, np.zeros((4, 6)), "xy")
    np.testing.assert_array_equal(np.asarray(y),
                                  (np.arange(24) * 1.5).reshape(4, 6))
    S.check_or_write_checksums(sto)   # verifies the reference's CRCs
    S.close_storage(sto)


def test_we_write_reference_reads(tmp_path):
    f = tmp_path / "ours.s3t"
    sto = S.create_storage(str(f), "xy", (4, 6), dtype=np.float64,
                           metadata="meta!", checksum=2)
    S.append_blocks(sto, [((0, 0), (4, 3)), ((0, 3), (4, 3))])
    S.save(1.0, (np.arange(24) * 1.5).reshape(4, 6), "xy", sto, "xy")
    S.close_storage(sto)

    exe = _compile(tmp_path, "reader", READER, f)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=60)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "ok" in out.stdout


READER_SHARDED = r"""
#include "superbblas.h"
#include <vector>
#include <cstdio>
using namespace superbblas;
int main() {
    constexpr std::size_t Nd = 2;
    Storage_handle sto;
    open_storage<Nd, double>("OUT", false, &sto);
    check_storage<Nd, double>(sto);   // verify per-shard block CRCs
    Context ctx = createCpuContext();
    std::vector<PartitionItem<Nd>> p(1);
    p[0][0] = Coor<Nd>{0, 0}; p[0][1] = Coor<Nd>{8, 6};
    std::vector<double> v(48, 0.0);
    double *ptr = v.data();
    load<Nd, Nd, double, double>(1.0, sto, "xy", Coor<Nd>{0, 0},
                                 Coor<Nd>{8, 6}, p.data(), 1, "xy",
                                 Coor<Nd>{0, 0}, Coor<Nd>{8, 6}, &ptr, &ctx,
                                 SlowToFast, Copy);
    close_storage<Nd, double>(sto);
    for (int i = 0; i < 48; ++i)
        if (v[i] != i * 1.5) { std::printf("bad %d\n", i); return 3; }
    std::printf("ok\n");
    return 0;
}
"""


def test_sharded_write_reference_reads(tmp_path):
    """A checkpoint written shard-by-shard from an 8-device mesh is a plain
    S3T file the reference implementation loads and checksum-verifies."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from superbblas_tpu import parallel as par

    mesh = par.make_mesh({"X": 4, "Y": 2})
    xg = (np.arange(48) * 1.5).reshape(8, 6)
    x = jax.device_put(jnp.asarray(xg), NamedSharding(mesh, P("X", "Y")))

    f = tmp_path / "sharded.s3t"
    sto = S.create_storage(str(f), "xy", (8, 6), dtype=np.float64,
                           checksum=2)
    S.save_sharded(sto, x, "xy")
    S.close_storage(sto)

    exe = _compile(tmp_path, "reader_sharded", READER_SHARDED, f)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=60)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "ok" in out.stdout


def test_header_and_blocks_api_on_reference_file(tmp_path):
    """read_storage_header + get_blocks against a file the REFERENCE
    implementation wrote (read_storage_header storage.h:2161;
    get_blocks storage.h:2330-2344)."""
    f = tmp_path / "ref_api.s3t"
    exe = _compile(tmp_path, "writer_api", WRITER, f)
    subprocess.run([str(exe)], check=True, timeout=60)

    dtype, metadata, dim, level = S.read_storage_header(str(f))
    assert dtype == np.float64
    assert metadata == "meta!"
    assert dim == (4, 6)
    assert level == 2

    sto = S.open_storage(str(f), mode="r")
    assert sorted(S.get_blocks(sto, "xy")) == [
        ((0, 0), (4, 3)), ((0, 3), (4, 3))]
    assert sorted(S.get_blocks(sto, "xy", "yx")) == [
        ((0, 0), (3, 4)), ((3, 0), (3, 4))]
    S.close_storage(sto)
