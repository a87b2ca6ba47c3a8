"""Terminal property editor (frontend/properties.py — the reference's
mandarin_duck windows/elements property UI counterpart).

Contract: every registry field resolves against its live entity; edits
flow through the Host set_<entity> API (dirty-flag path) and clamp to
their declared ranges; the panel renders a line per field with the
selection highlighted.
"""

import numpy as np

from luminary_tpu.frontend.properties import (
    ENTITY_ORDER,
    PROPERTY_REGISTRY,
    PropertyPanel,
    _get,
)
from luminary_tpu.host.host import Host


def _host():
    h = Host()
    from luminary_tpu.testing import sun_plane_scene

    h.scene = sun_plane_scene(8, 8)
    return h


def test_registry_fields_all_resolve():
    h = _host()
    for ent_name, props in PROPERTY_REGISTRY.items():
        ent = getattr(h, f"get_{ent_name}")()
        for p in props:
            v = _get(ent, p.attr)
            if p.kind == "vec3":
                assert len(v) >= 3
            else:
                assert v is not None
    h.destroy()


def test_panel_edit_cycle():
    h = _host()
    panel = PropertyPanel()
    assert panel.handle_key("e", h) and panel.open
    # navigate to the ocean entity page
    while panel.entity != "ocean":
        panel.handle_key("]", h)
    # field 0 is 'active' (bool): space toggles through the Host API
    assert PROPERTY_REGISTRY["ocean"][0].attr == "active"
    assert not h.get_ocean().active
    panel.handle_key(" ", h)
    assert h.get_ocean().active
    # select 'height' and bump it twice (+0.25 each)
    while PROPERTY_REGISTRY["ocean"][panel.field_i].attr != "height":
        panel.handle_key("n", h)
    h0 = h.get_ocean().height
    panel.handle_key(".", h)
    panel.handle_key(".", h)
    assert h.get_ocean().height == np.float32(h0 + 0.5) or abs(
        h.get_ocean().height - (h0 + 0.5)) < 1e-6
    # camera vec3 component edit
    while panel.entity != "camera":
        panel.handle_key("[", h)
    x0 = h.get_camera().pos[0]
    panel.handle_key(".", h)
    assert abs(h.get_camera().pos[0] - (x0 + 0.5)) < 1e-6
    # int clamp: settings max depth cannot go below 1
    while panel.entity != "settings":
        panel.handle_key("]", h)
    for _ in range(30):
        panel.handle_key(",", h)
    assert h.get_settings().max_ray_depth == 1
    h.destroy()


def test_panel_renders_lines():
    h = _host()
    panel = PropertyPanel()
    assert panel.render(h) == []  # closed → no lines
    panel.handle_key("e", h)
    lines = panel.render(h)
    assert len(lines) == 1 + len(PROPERTY_REGISTRY[ENTITY_ORDER[0]])
    assert "\x1b[7m" in "".join(lines)  # a highlighted selection exists
    h.destroy()
