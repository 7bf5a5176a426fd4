from fithubert_tpu.models.student import StudentModel, StudentOutput
from fithubert_tpu.models.teacher import TeacherModel, TeacherOutput, TeacherGeometry
