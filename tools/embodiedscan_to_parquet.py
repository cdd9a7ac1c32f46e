#!/usr/bin/env python3
"""One-time landing-zone converter: EmbodiedScan pickle -> parquet tables.

Pickle is a Python-native contract, so the conversion runs driver-side once
(S10; matterport_processor.py:44-133); everything downstream is the Spark
join path in MatterportSources.matterportFrames.

Emits three relational tables under OUT_DIR:
  categories.parquet  (label_id BIGINT, name VARCHAR)
  instances.parquet   (scene_id, sample_idx, bbox_id BIGINT,
                       cx..cz, dx..dz, rx..rz DOUBLE, label_id BIGINT)
  images.parquet      (scene_id, sample_idx, frame_id, img_path,
                       visible_instance_ids LIST<BIGINT>)

Usage: python3 tools/embodiedscan_to_parquet.py EMBODIEDSCAN_DIR OUT_DIR
  expects EMBODIEDSCAN_DIR/embodiedscan-v2/embodiedscan_infos_{train,val}.pkl
"""
import pickle, sys
from pathlib import Path

import pandas as pd


def convert(es_dir: Path, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    categories, instances, images = {}, [], []

    for split in ["train", "val"]:
        pkl = es_dir / "embodiedscan-v2" / f"embodiedscan_infos_{split}.pkl"
        if not pkl.exists():
            print(f"skip missing {pkl}", file=sys.stderr)
            continue
        with open(pkl, "rb") as f:
            data = pickle.load(f)

        # metainfo categories are {name: id}; the mapping table wants id -> name
        for name, label_id in data.get("metainfo", {}).get("categories", {}).items():
            categories[int(label_id)] = name

        for item in data.get("data_list", []):
            sample_idx = item.get("sample_idx", "")
            if not sample_idx.startswith("matterport3d/"):
                continue
            parts = sample_idx.split("/")
            if len(parts) < 2:
                continue
            scene_id = parts[1]

            for inst in item.get("instances", []):
                bbox = inst.get("bbox_3d", [])
                if len(bbox) != 9:
                    continue
                instances.append(
                    dict(scene_id=scene_id, sample_idx=sample_idx,
                         bbox_id=int(inst.get("bbox_id", -1)),
                         cx=bbox[0], cy=bbox[1], cz=bbox[2],
                         dx=bbox[3], dy=bbox[4], dz=bbox[5],
                         rx=bbox[6], ry=bbox[7], rz=bbox[8],
                         label_id=int(inst.get("bbox_label_3d", -1))))

            for img in item.get("images", []):
                img_path = img.get("img_path", "")
                if not img_path:
                    continue
                images.append(
                    dict(scene_id=scene_id, sample_idx=sample_idx,
                         frame_id=Path(img_path).stem, img_path=img_path,
                         visible_instance_ids=[int(i) for i in img.get("visible_instance_ids", [])]))

    pd.DataFrame(sorted(categories.items()), columns=["label_id", "name"]).to_parquet(
        out_dir / "categories.parquet", index=False)
    pd.DataFrame(instances).to_parquet(out_dir / "instances.parquet", index=False)
    pd.DataFrame(images).to_parquet(out_dir / "images.parquet", index=False)
    print(f"wrote {len(categories)} categories, {len(instances)} instances, "
          f"{len(images)} images to {out_dir}")


if __name__ == "__main__":
    convert(Path(sys.argv[1]), Path(sys.argv[2]))
