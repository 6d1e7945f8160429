"""Parse the reference's Testing Scene into a committed JSON fixture.

Reads `/root/reference/Assets/Scenes/Testing Scene.unity` (9,685-line
Unity YAML; 31 RayTracingSphere + 31 RayTracingMesh components in
feature groups, SURVEY.md §2) and emits
`halogen_tpu/scene/assets/testing_scene.json`: every ray-traced object
with its exact world transform, HalogenMaterial values
(RayTracingManager.cs:7-38 field for field), radius or mesh source, and
active state — plus the main camera. The committed JSON makes the
composite fixture standalone (tests never read /root/reference).

Usage: python scripts/parse_unity_scene.py [--scene PATH] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

import numpy as np
import yaml

SPHERE_GUID = "0ade5bca988736640ae196807e39b943"  # RayTracingSphere.cs.meta
MESH_GUID = "40cc63cfb0d461f4394420f60095ba05"    # RayTracingMesh.cs.meta

# FBX model guids (Assets/Models/*.fbx.meta) -> repo npz fixture names.
# Dragon_87k.fbx is a missing large blob in the reference snapshot
# (.MISSING_LARGE_BLOBS:1); its instances map to the dragon_8k fixture.
MODEL_GUIDS = {
    "d7e75f21fe9c0014bad984356637dc2b": "dragon_8k",
    "c14e9670d0fa65e419bb03db929dbf6b": "suzanne",
    "dc42c6a5dfbbc0843940fea8542c0f04": "closet",
    "a47406085bc6ffa438b22eca58eb7b10": "dragon_87k",
}

# Unity builtin mesh fileIDs (guid 0000000000000000e000000000000000)
BUILTIN_MESHES = {
    10202: "cube", 10206: "cylinder", 10207: "sphere_mesh",
    10208: "capsule", 10209: "plane", 10210: "quad",
}

# scene-embedded mesh assets (class !u!43 docs inside the .unity file)
EMBEDDED_MESHES = {
    1763405783: "closet",  # "Closet Mesh Instance Instance", 811 verts
}


def parse_unity_yaml(path: str):
    """-> {fileID: (class_name, dict)} for every document."""
    text = pathlib.Path(path).read_text()
    docs = {}
    for m in re.finditer(
            r"^--- !u!\d+ &(\d+)( stripped)?\n(.*?)(?=^--- |\Z)",
            text, re.M | re.S):
        fid = int(m.group(1))
        body = m.group(3)
        try:
            data = yaml.safe_load(body)
        except yaml.YAMLError:
            continue
        if not isinstance(data, dict) or len(data) != 1:
            continue
        cls, fields = next(iter(data.items()))
        docs[fid] = (cls, fields or {})
    return docs


def v3(d):
    return [float(d["x"]), float(d["y"]), float(d["z"])]


def quat_mat(q):
    x, y, z, w = (float(q["x"]), float(q["y"]), float(q["z"]),
                  float(q["w"]))
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def local_matrix(tr):
    m = np.eye(4)
    m[:3, :3] = quat_mat(tr["m_LocalRotation"]) @ np.diag(
        v3(tr["m_LocalScale"]))
    m[:3, 3] = v3(tr["m_LocalPosition"])
    return m


def color4(d):
    return [float(d["r"]), float(d["g"]), float(d["b"]), float(d["a"])]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/Assets/Scenes/"
                            "Testing Scene.unity")
    ap.add_argument("--out",
                    default=str(pathlib.Path(__file__).resolve().parents[1]
                                / "halogen_tpu/scene/assets/"
                                  "testing_scene.json"))
    args = ap.parse_args()

    docs = parse_unity_yaml(args.scene)
    gos = {f: d for f, (c, d) in docs.items() if c == "GameObject"}
    trs = {f: d for f, (c, d) in docs.items() if c == "Transform"}
    monos = {f: d for f, (c, d) in docs.items() if c == "MonoBehaviour"}
    filters = {f: d for f, (c, d) in docs.items() if c == "MeshFilter"}
    cameras = {f: d for f, (c, d) in docs.items() if c == "Camera"}
    prefabs = {f: d for f, (c, d) in docs.items()
               if c == "PrefabInstance"}

    def prefab_info(pf_fid):
        """(local_matrix, parent_transform_fid, name, source_guid) of a
        PrefabInstance: FBX models are prefabs in Unity, so Dragon_87k
        etc. land in the scene as PrefabInstance docs whose TRS lives
        in m_Modifications property overrides."""
        pf = prefabs[pf_fid]
        mod = pf.get("m_Modification", {})
        props = {}
        name = "?"
        for entry in mod.get("m_Modifications", []) or []:
            props[entry.get("propertyPath", "")] = entry.get("value")
        name = props.get("m_Name", "?")

        def vec(prefix, default):
            return [float(props.get(f"{prefix}.{ax}", dv))
                    for ax, dv in zip("xyz", default)]

        pos = vec("m_LocalPosition", (0, 0, 0))
        scale = vec("m_LocalScale", (1, 1, 1))
        rot = {ax: float(props.get(f"m_LocalRotation.{ax}", dv))
               for ax, dv in zip("xyzw", (0, 0, 0, 1))}
        m = np.eye(4)
        m[:3, :3] = quat_mat(rot) @ np.diag(scale)
        m[:3, 3] = pos
        parent = mod.get("m_TransformParent", {}).get("fileID", 0)
        guid = (pf.get("m_SourcePrefab", {}) or {}).get("guid", "")
        return m, parent, name, guid

    go_transform = {d["m_GameObject"]["fileID"]: (f, d)
                    for f, d in trs.items()
                    if isinstance(d, dict) and "m_GameObject" in d}
    go_filter = {d["m_GameObject"]["fileID"]: d for d in filters.values()
                 if isinstance(d, dict) and "m_GameObject" in d}

    def world_matrix(go_fid):
        tf, tr = go_transform[go_fid]
        m = local_matrix(tr)
        father = tr.get("m_Father", {}).get("fileID", 0)
        while father:
            ptr = trs[father]
            m = local_matrix(ptr) @ m
            father = ptr.get("m_Father", {}).get("fileID", 0)
        return m

    def effective_active(go_fid):
        active = bool(gos[go_fid].get("m_IsActive", 1))
        tf, tr = go_transform[go_fid]
        father = tr.get("m_Father", {}).get("fileID", 0)
        while father:
            pgo = trs[father]["m_GameObject"]["fileID"]
            active = active and bool(gos[pgo].get("m_IsActive", 1))
            father = trs[father].get("m_Father", {}).get("fileID", 0)
        return active

    def path_name(go_fid):
        parts = [gos[go_fid].get("m_Name", "?")]
        tf, tr = go_transform[go_fid]
        father = tr.get("m_Father", {}).get("fileID", 0)
        while father:
            pgo = trs[father]["m_GameObject"]["fileID"]
            parts.append(gos[pgo].get("m_Name", "?"))
            father = trs[father].get("m_Father", {}).get("fileID", 0)
        return "/".join(reversed(parts))

    def material_dict(m):
        return {
            "color": color4(m["color"]),
            "roughness": float(m["roughness"]),
            "metallic": float(m["metallic"]),
            "specular_color": color4(m["specularColor"])[:3],
            "subsurface_color": color4(m["subsurfaceColor"])[:3],
            "ior": float(m["indexOfRefraction"]),
            "absorption": float(m["absorption"]),
            "dielectric_priority": int(m["dielectricPriority"]),
            "emission_color": color4(m["emissionColor"])[:3],
            "emission_intensity": float(m["emissionIntensity"]),
        }

    def ancestors_world_active(tr_fid):
        """(matrix, active) accumulated over a transform chain starting
        AT tr_fid (inclusive)."""
        m = np.eye(4)
        active = True
        cur = tr_fid
        while cur:
            tr = trs[cur]
            m = local_matrix(tr) @ m
            pgo = tr["m_GameObject"]["fileID"]
            active = active and bool(gos[pgo].get("m_IsActive", 1))
            cur = tr.get("m_Father", {}).get("fileID", 0)
        return m, active

    objects = []
    for fid, d in sorted(monos.items()):
        guid = d.get("m_Script", {}).get("guid")
        if guid not in (SPHERE_GUID, MESH_GUID):
            continue
        go = d["m_GameObject"]["fileID"]
        mesh_src = None
        if go in go_transform:
            obj = {
                "name": gos[go].get("m_Name", "?"),
                "path": path_name(go),
                "active": effective_active(go),
                "world": [round(float(x), 9) for x in
                          world_matrix(go).reshape(-1)],
            }
            mf = go_filter.get(go)
            mesh_ref = (mf or {}).get("m_Mesh", {})
            mguid = mesh_ref.get("guid", "")
            mfid = mesh_ref.get("fileID", 0)
            if mguid in MODEL_GUIDS:
                mesh_src = {"kind": "asset", "name": MODEL_GUIDS[mguid]}
            elif not mguid and mfid in EMBEDDED_MESHES:
                mesh_src = {"kind": "asset",
                            "name": EMBEDDED_MESHES[mfid]}
            elif mfid in BUILTIN_MESHES:
                mesh_src = {"kind": "builtin",
                            "name": BUILTIN_MESHES[mfid]}
            elif mfid or mguid:
                mesh_src = {"kind": "unknown", "guid": mguid,
                            "fileID": int(mfid)}
        else:
            # component added onto a prefab-instanced model (stripped
            # GameObject): TRS comes from the PrefabInstance overrides
            pf_fid = gos[go]["m_PrefabInstance"]["fileID"]
            m_local, parent, name, pguid = prefab_info(pf_fid)
            if parent:
                m_par, active = ancestors_world_active(parent)
            else:
                m_par, active = np.eye(4), True
            obj = {
                "name": name,
                "path": name,
                "active": active,
                "world": [round(float(x), 9) for x in
                          (m_par @ m_local).reshape(-1)],
            }
            if pguid in MODEL_GUIDS:
                mesh_src = {"kind": "asset", "name": MODEL_GUIDS[pguid]}
            else:
                mesh_src = {"kind": "unknown", "guid": pguid,
                            "fileID": 0}
        obj["material"] = material_dict(d["material"])
        if guid == SPHERE_GUID:
            obj["type"] = "sphere"
            obj["radius"] = float(d.get("Radius", 0.5))
        else:
            obj["type"] = "mesh"
            obj["mesh"] = mesh_src or {"kind": "unknown", "guid": "",
                                       "fileID": 0}
        objects.append(obj)

    cams = []
    for fid, d in cameras.items():
        go = d["m_GameObject"]["fileID"]
        cams.append({
            "name": gos[go].get("m_Name", "?"),
            "active": effective_active(go),
            "world": [round(float(x), 9) for x in
                      world_matrix(go).reshape(-1)],
            "fov_deg": float(d.get("field of view", 60)),
            "near": float(d.get("near clip plane", 0.3)),
            "far": float(d.get("far clip plane", 1000)),
        })

    out = {
        "source": "Assets/Scenes/Testing Scene.unity "
                  "(Kabinet0/Halogen-Pathtracer)",
        "objects": objects,
        "cameras": cams,
        "counts": {
            "spheres": sum(o["type"] == "sphere" for o in objects),
            "meshes": sum(o["type"] == "mesh" for o in objects),
        },
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"{args.out}: {out['counts']} "
          f"active={sum(o['active'] for o in objects)}")
    from collections import Counter
    print(Counter(tuple(o.get('mesh', {}).values())
                  for o in objects if o['type'] == 'mesh'))


if __name__ == "__main__":
    main()
