"""Multiclass classification with TabPFNClassifier (cf. reference
`models/mmpfn/examples/tabpfn_for_multiclass_classification.py`)."""

from sklearn.datasets import load_iris
from sklearn.metrics import accuracy_score, roc_auc_score
from sklearn.model_selection import train_test_split

from multimodalpfn_tpu import TabPFNClassifier

X, y = load_iris(return_X_y=True)
X_train, X_test, y_train, y_test = train_test_split(X, y, test_size=0.33, random_state=42)

# model_path="auto" loads the published tabpfn-v2-classifier.ckpt from the model
# cache; "random:0" runs the architecture with fresh weights (for smoke tests).
clf = TabPFNClassifier(model_path="auto")
clf.fit(X_train, y_train)

proba = clf.predict_proba(X_test)
print("ROC AUC (ovo):", roc_auc_score(y_test, proba, multi_class="ovo"))
print("Accuracy:", accuracy_score(y_test, clf.predict(X_test)))
