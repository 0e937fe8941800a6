from .builder import SubjectBuilder
from .covariate import Covariate, Covariates
from .error_model import AssayErrorModel, AssayErrorModels, ErrorPoly, Factor
from .event import Bolus, Censor, Infusion, Observation
from .residual_error import ResidualErrorModel, ResidualErrorModels
from .structs import Data, Occasion, Subject
