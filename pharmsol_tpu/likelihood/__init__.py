from .distributions import lognormccdf, lognormcdf, lognormpdf
from .prediction import PopulationPredictions, Prediction, SubjectPredictions
