from .mesh import make_mesh
from .train import dp_train_call, sharded_pdf
