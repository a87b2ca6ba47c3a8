""".lum v5 language tests (reference: host/lum/* tokenizer→compiler→VM;
the reference pipeline compiles but never applies — ours executes)."""

import numpy as np
import pytest

from luminary_tpu.io.lum import parse_lum
from luminary_tpu.io.lum_v5 import (
    LumVM,
    Op,
    compile_lum_v5,
    decode,
    encode,
    tokenize,
)
from luminary_tpu.utils.errors import FileIOError

SCRIPT = """Luminary
VERSION 5

settings s = settings.init();
s.width = 320;
s.height = 90 + 90;
s.max_ray_depth = 2 * 3;

camera c = camera.init();
c.pos = vec3(0.0, 1.0, 3.5);
c.exposure = 2.0;

sky k = sky.init();
k.mode = SKY_MODE_CONSTANT_COLOR;
k.constant_color = rgb(0.5, 0.25, 0.125);

mesh m = mesh.load("box.obj");
instance i = instance.init(m);
i.position = vec3(1, -2, 0.5);
"""


def test_instruction_roundtrip():
    w = encode(Op.CALL, dst=7, src0=3, src1=2, imm=123456)
    op, dst, s0, s1, imm = decode(w)
    assert (op, dst, s0, s1, imm) == (Op.CALL, 7, 3, 2, 123456)


def test_tokenizer_kinds():
    toks = tokenize('cam.fov = 0.35; # comment\nname = "str";')
    kinds = [t.kind for t in toks]
    assert kinds == ["ident", "sep", "ident", "op", "number", "sep",
                     "ident", "op", "string", "sep"]


def test_compile_produces_instructions():
    b = compile_lum_v5("settings s = settings.init();\ns.width = 64;")
    assert b.instructions[-1] & 0xFF == int(Op.RET)
    ops = [decode(w)[0] for w in b.instructions]
    assert Op.CALL in ops and Op.SETM in ops and Op.LOADC in ops
    assert "CALL" in b.disassemble()


def test_v5_script_applies_to_content():
    content = parse_lum(SCRIPT)
    assert content.settings.width == 320
    assert content.settings.height == 180
    assert content.settings.max_ray_depth == 6
    assert content.camera.pos == (0.0, 1.0, 3.5)
    assert content.camera.exposure == 2.0
    assert int(content.sky.mode) == 2
    assert content.sky.constant_color == (0.5, 0.25, 0.125)
    assert content.obj_file_paths == ["box.obj"]
    assert len(content.instances) == 1
    assert content.instances[0].mesh_id == 0
    assert content.instances[0].position == (1.0, -2.0, 0.5)


def test_v5_expression_precedence():
    content = parse_lum(
        "Luminary\nVERSION 5\nsettings s = settings.init();\n"
        "s.width = 2 + 3 * 4;\ns.height = -2 * -8;"
    )
    assert content.settings.width == 14
    assert content.settings.height == 16


def test_v5_errors():
    with pytest.raises(FileIOError):
        parse_lum("Luminary\nVERSION 5\nx.width = 3;")  # undeclared
    with pytest.raises(FileIOError):
        parse_lum("Luminary\nVERSION 5\nsettings s = settings.boom();")
    with pytest.raises(FileIOError):
        parse_lum('Luminary\nVERSION 5\nsettings s = settings.init();\ns.nope = 1;')
