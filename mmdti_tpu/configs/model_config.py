"""Checkpoint-name / dictionary-name map.

Parity with the reference MODEL_CONFIG (/root/reference/config/model_config.py):
maps data types to the pretrained Uni-Mol checkpoint filenames and dictionary
files users supply via unimol_dir.
"""

MODEL_CONFIG = {
    "weight": {
        "protein": "poc_pre_220816.pt",
        "molecule_no_h": "mol_pre_no_h_220816.pt",
        "molecule_all_h": "mol_pre_all_h_220816.pt",
        "crystal": "mp_all_h_230313.pt",
        "mof": "mof_pre_no_h_CORE_MAP_20230505.pt",
        "oled": "oled_pre_no_h_230101.pt",
    },
    "dict": {
        "protein": "poc.dict.txt",
        "molecule_no_h": "mol.dict.txt",
        "molecule_all_h": "mol.dict.txt",
        "crystal": "mp.dict.txt",
        "mof": "mof.dict.txt",
        "oled": "oled.dict.txt",
    },
}
