from mmdti_tpu.chem.dictionary import Dictionary  # noqa: F401
from mmdti_tpu.chem.smiles import (  # noqa: F401
    Molecule,
    SmilesError,
    is_valid_smiles,
    parse_smiles,
)
from mmdti_tpu.chem.scaffold import murcko_scaffold  # noqa: F401
from mmdti_tpu.chem.conformer import (  # noqa: F401
    ConformerGen,
    coords2unimol,
    inner_coords,
    smi2coords,
)
from mmdti_tpu.chem.tokenizer import SmilesTokenizer, load_tokenizer  # noqa: F401
