from fithubert_tpu.data.librispeech import BucketedLibriSpeech, SyntheticDataset, make_dataset
