"""A real, trainable language-ID model for the ``lang_id`` registry slot.

The engine's default language detection is the codegen marker-word
heuristic in ``operators/textstats.py`` (the honest stand-in documented
since round 1 — a fastText-class model's weights don't ship in this
sandbox).  This module proves the MODEL SLOT itself end-to-end with a real
learned classifier built from nothing but numpy: a multinomial Naive Bayes
over hashed character trigrams — the same family langdetect/fastText
reduce to at small scale (char n-gram features × linear log-odds), and the
shape the reference's ``LanguageAnalyser.java:65`` wraps (langdetect's
n-gram profiles ARE per-language n-gram log-frequencies).

Protocol expected by ``textstats.register_lang_id_model``:

    model.predict_batch(texts: Sequence[str | None]) -> list[str | None]

Anything satisfying it (a fastText wrapper, an ONNX session, this class)
drops into the same Arrow-batched UDF; the model object is pickled to the
executors once per task via closure capture, so keep it small or wrap a
broadcast variable for multi-MB weights.
"""

from __future__ import annotations

import numpy as np

__all__ = ["CharNgramNB", "train_demo_model", "default_model",
           "DEMO_SENTENCES", "HELD_OUT"]


class CharNgramNB:
    """Multinomial Naive Bayes over hashed character trigrams.

    Features: all char 3-grams of ``" " + lower(text) + " "`` hashed into
    ``n_buckets`` (vectorized numpy view-as-bytes hashing, no Python per
    n-gram); training = Laplace-smoothed log-frequencies per class, i.e.
    exactly langdetect's per-language n-gram profile table; prediction =
    argmax of summed log-probabilities + log-prior."""

    def __init__(self, n_buckets: int = 1 << 15, alpha: float = 0.5):
        self.n_buckets = n_buckets
        self.alpha = alpha
        self.classes_: list[str] = []
        self.log_prob_: np.ndarray | None = None  # (C, n_buckets) float32
        self.log_prior_: np.ndarray | None = None  # (C,) float32

    # -- feature hashing -------------------------------------------------
    def _bucket_counts(self, text: str) -> np.ndarray:
        """Hashed-trigram count vector (n_buckets,) int64, fully vectorized:
        utf-8 bytes → all length-3 byte windows → FNV-1a-style mix → bucket."""
        b = (" " + text.lower() + " ").encode("utf-8", "replace")
        arr = np.frombuffer(b, dtype=np.uint8)
        if arr.size < 3:
            return np.zeros(self.n_buckets, dtype=np.int64)
        with np.errstate(over="ignore"):
            h = (
                arr[:-2].astype(np.uint64) * np.uint64(0x100000001B3)
                + arr[1:-1].astype(np.uint64) * np.uint64(0x01000193)
                + arr[2:].astype(np.uint64)
            )
            h ^= h >> np.uint64(15)
        buckets = (h % np.uint64(self.n_buckets)).astype(np.int64)
        return np.bincount(buckets, minlength=self.n_buckets)

    # -- training --------------------------------------------------------
    def fit(self, texts: list[str], labels: list[str]) -> "CharNgramNB":
        self.classes_ = sorted(set(labels))
        idx = {c: i for i, c in enumerate(self.classes_)}
        counts = np.zeros((len(self.classes_), self.n_buckets), dtype=np.float64)
        prior = np.zeros(len(self.classes_), dtype=np.float64)
        for t, lab in zip(texts, labels):
            counts[idx[lab]] += self._bucket_counts(t)
            prior[idx[lab]] += 1
        counts += self.alpha
        self.log_prob_ = np.log(counts / counts.sum(axis=1, keepdims=True)).astype(np.float32)
        self.log_prior_ = np.log(prior / prior.sum()).astype(np.float32)
        return self

    # -- inference (the registry protocol) -------------------------------
    def predict_batch(self, texts) -> list[str | None]:
        assert self.log_prob_ is not None, "fit() first"
        out: list[str | None] = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            v = self._bucket_counts(t)
            nz = np.nonzero(v)[0]
            if nz.size == 0:
                out.append("und")
                continue
            scores = self.log_prob_[:, nz] @ v[nz] + self.log_prior_
            out.append(self.classes_[int(np.argmax(scores))])
        return out


#: embedded training corpus (original sentences, one list per language) —
#: enough signal for char-trigram NB to separate 24 high-volume web
#: languages; a production deployment swaps in real weights through the
#: identical registry call.  Four shared "concepts" per language keep the
#: corpus topically balanced so the classifier learns orthography, not
#: vocabulary domain.
DEMO_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "archives of the web preserve pages that would otherwise be lost forever",
        "this document describes how the crawler schedules and fetches new pages",
        "a library collects books and keeps them available for future readers",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am flussufer",
        "das webarchiv bewahrt seiten auf die sonst für immer verloren wären",
        "dieses dokument beschreibt wie der crawler neue seiten plant und abruft",
        "eine bibliothek sammelt bücher und hält sie für künftige leser bereit",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux près de la rivière",
        "les archives du web conservent des pages qui seraient perdues à jamais",
        "ce document décrit comment le robot planifie et récupère les nouvelles pages",
        "une bibliothèque rassemble des livres et les garde pour les lecteurs futurs",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "los archivos de la web conservan páginas que de otro modo se perderían",
        "este documento describe cómo el rastreador programa y recupera páginas nuevas",
        "una biblioteca reúne libros y los mantiene disponibles para futuros lectores",
    ],
    "it": [
        "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
        "gli archivi del web conservano pagine che altrimenti andrebbero perdute",
        "questo documento descrive come il crawler pianifica e recupera nuove pagine",
        "una biblioteca raccoglie libri e li conserva per i lettori futuri",
    ],
    "pt": [
        "a rápida raposa marrom salta sobre o cão preguiçoso perto do rio",
        "os arquivos da web preservam páginas que de outra forma se perderiam",
        "este documento descreve como o rastreador agenda e busca novas páginas",
        "uma biblioteca reúne livros e os mantém disponíveis para futuros leitores",
    ],
    "nl": [
        "de snelle bruine vos springt over de luie hond bij de rivieroever",
        "het webarchief bewaart pagina's die anders voorgoed verloren zouden gaan",
        "dit document beschrijft hoe de crawler nieuwe pagina's plant en ophaalt",
        "een bibliotheek verzamelt boeken en houdt ze beschikbaar voor toekomstige lezers",
    ],
    "ru": [
        "быстрая коричневая лиса прыгает через ленивую собаку у берега реки",
        "вебархивы сохраняют страницы которые иначе были бы потеряны навсегда",
        "этот документ описывает как краулер планирует и загружает новые страницы",
        "библиотека собирает книги и хранит их для будущих читателей",
    ],
    "pl": [
        "szybki brązowy lis skacze przez leniwego psa nad brzegiem rzeki",
        "archiwa sieci zachowują strony które inaczej zostałyby utracone na zawsze",
        "ten dokument opisuje jak robot planuje i pobiera nowe strony",
        "biblioteka gromadzi książki i udostępnia je przyszłym czytelnikom",
    ],
    "cs": [
        "rychlá hnědá liška skáče přes líného psa u břehu řeky",
        "webové archivy uchovávají stránky které by jinak byly navždy ztraceny",
        "tento dokument popisuje jak robot plánuje a stahuje nové stránky",
        "knihovna shromažďuje knihy a uchovává je pro budoucí čtenáře",
    ],
    "sv": [
        "den snabba bruna räven hoppar över den lata hunden vid flodstranden",
        "webbarkiven bevarar sidor som annars skulle gå förlorade för alltid",
        "detta dokument beskriver hur roboten planerar och hämtar nya sidor",
        "ett bibliotek samlar böcker och håller dem tillgängliga för framtida läsare",
    ],
    "da": [
        "den hurtige brune ræv springer over den dovne hund ved flodbredden",
        "webarkiverne bevarer sider som ellers ville gå tabt for altid",
        "dette dokument beskriver hvordan robotten planlægger og henter nye sider",
        "et bibliotek samler bøger og holder dem tilgængelige for fremtidige læsere",
    ],
    "no": [
        "den raske brune reven hopper over den late hunden ved elvebredden",
        "nettarkivene bevarer sider som ellers ville gått tapt for alltid",
        "dette dokumentet beskriver hvordan roboten planlegger og henter nye sider",
        "et bibliotek samler bøker og holder dem tilgjengelige for fremtidige lesere",
    ],
    "fi": [
        "nopea ruskea kettu hyppää laiskan koiran yli joen rannalla",
        "verkkoarkistot säilyttävät sivut jotka muuten katoaisivat ikuisesti",
        "tämä asiakirja kuvaa kuinka robotti suunnittelee ja noutaa uusia sivuja",
        "kirjasto kerää kirjoja ja pitää ne tulevien lukijoiden saatavilla",
    ],
    "hu": [
        "a gyors barna róka átugrik a lusta kutya felett a folyóparton",
        "a webarchívumok megőrzik azokat az oldalakat amelyek különben örökre elvesznének",
        "ez a dokumentum leírja hogyan tervezi és tölti le a robot az új oldalakat",
        "a könyvtár könyveket gyűjt és elérhetővé teszi őket a jövő olvasói számára",
    ],
    "ro": [
        "vulpea maro rapidă sare peste câinele leneș lângă malul râului",
        "arhivele web păstrează paginile care altfel s-ar pierde pentru totdeauna",
        "acest document descrie cum robotul planifică și descarcă pagini noi",
        "o bibliotecă adună cărți și le păstrează pentru cititorii viitori",
    ],
    "tr": [
        "hızlı kahverengi tilki nehir kıyısında tembel köpeğin üzerinden atlar",
        "web arşivleri aksi halde sonsuza dek kaybolacak sayfaları korur",
        "bu belge tarayıcının yeni sayfaları nasıl planlayıp indirdiğini anlatır",
        "bir kütüphane kitapları toplar ve gelecekteki okuyucular için saklar",
    ],
    "id": [
        "rubah coklat yang cepat melompati anjing malas di tepi sungai",
        "arsip web menyimpan halaman yang jika tidak akan hilang selamanya",
        "dokumen ini menjelaskan bagaimana perayap menjadwalkan dan mengambil halaman baru",
        "perpustakaan mengumpulkan buku dan menyimpannya untuk pembaca masa depan",
    ],
    "vi": [
        "con cáo nâu nhanh nhẹn nhảy qua con chó lười bên bờ sông",
        "kho lưu trữ web giữ lại những trang mà nếu không sẽ mất vĩnh viễn",
        "tài liệu này mô tả cách trình thu thập lên lịch và tải các trang mới",
        "thư viện thu thập sách và giữ chúng cho độc giả tương lai",
    ],
    "sw": [
        "mbweha mwepesi wa kahawia anaruka juu ya mbwa mvivu kando ya mto",
        "kumbukumbu za wavuti huhifadhi kurasa ambazo zingepotea milele",
        "hati hii inaeleza jinsi mtambaazi anavyopanga na kupakua kurasa mpya",
        "maktaba hukusanya vitabu na kuvihifadhi kwa wasomaji wa baadaye",
    ],
    "tl": [
        "ang mabilis na kayumangging soro ay tumatalon sa tamad na aso sa tabi ng ilog",
        "iniingatan ng mga archive ng web ang mga pahina na kung hindi ay mawawala magpakailanman",
        "inilalarawan ng dokumentong ito kung paano nagpaplano at kumukuha ng mga bagong pahina ang crawler",
        "ang aklatan ay nangongolekta ng mga libro at iniingatan ang mga ito para sa mga susunod na mambabasa",
    ],
    "el": [
        "η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί στην όχθη του ποταμού",
        "τα αρχεία του ιστού διατηρούν σελίδες που αλλιώς θα χάνονταν για πάντα",
        "αυτό το έγγραφο περιγράφει πώς ο ανιχνευτής προγραμματίζει και κατεβάζει νέες σελίδες",
        "μια βιβλιοθήκη συγκεντρώνει βιβλία και τα φυλά για τους μελλοντικούς αναγνώστες",
    ],
    "uk": [
        "швидка руда лисиця стрибає через ледачого пса на березі річки",
        "вебархіви зберігають сторінки які інакше були б втрачені назавжди",
        "цей документ описує як краулер планує та завантажує нові сторінки",
        "бібліотека збирає книжки та зберігає їх для майбутніх читачів",
    ],
    "ca": [
        "la ràpida guineu marró salta per sobre del gos mandrós a la vora del riu",
        "els arxius del web conserven pàgines que altrament es perdrien per sempre",
        "aquest document descriu com el rastrejador planifica i descarrega pàgines noves",
        "una biblioteca aplega llibres i els guarda per als lectors futurs",
    ],
}

#: held-out sentences (one per language, same register, NOT in the training
#: corpus) — the accuracy floor in ``test_langmodel`` evaluates on these
HELD_OUT: dict[str, str] = {
    "en": "researchers read old newspapers to better understand the past",
    "de": "forscher lesen alte zeitungen um die vergangenheit besser zu verstehen",
    "fr": "les chercheurs lisent de vieux journaux pour mieux comprendre le passé",
    "es": "los investigadores leen periódicos antiguos para comprender mejor el pasado",
    "it": "i ricercatori leggono vecchi giornali per comprendere meglio il passato",
    "pt": "os pesquisadores leem jornais antigos para compreender melhor o passado",
    "nl": "onderzoekers lezen oude kranten om het verleden beter te begrijpen",
    "ru": "исследователи читают старые газеты чтобы лучше понять прошлое",
    "pl": "badacze czytają stare gazety aby lepiej zrozumieć przeszłość",
    "cs": "výzkumníci čtou staré noviny aby lépe porozuměli minulosti",
    "sv": "forskare läser gamla tidningar för att bättre förstå det förflutna",
    "da": "forskere læser gamle aviser for bedre at forstå fortiden",
    "no": "forskere leser gamle aviser for å forstå fortiden bedre",
    "fi": "tutkijat lukevat vanhoja sanomalehtiä ymmärtääkseen menneisyyttä paremmin",
    "hu": "a kutatók régi újságokat olvasnak hogy jobban megértsék a múltat",
    "ro": "cercetătorii citesc ziare vechi pentru a înțelege mai bine trecutul",
    "tr": "araştırmacılar geçmişi daha iyi anlamak için eski gazeteleri okur",
    "id": "para peneliti membaca koran lama untuk memahami masa lalu dengan lebih baik",
    "vi": "các nhà nghiên cứu đọc báo cũ để hiểu rõ hơn về quá khứ",
    "sw": "watafiti husoma magazeti ya zamani ili kuelewa historia vizuri zaidi",
    "tl": "binabasa ng mga mananaliksik ang mga lumang pahayagan upang mas maunawaan ang nakaraan",
    "el": "οι ερευνητές διαβάζουν παλιές εφημερίδες για να κατανοήσουν καλύτερα το παρελθόν",
    "uk": "дослідники читають старі газети щоб краще зрозуміти минуле",
    "ca": "els investigadors llegeixen diaris antics per entendre millor el passat",
}


def train_demo_model() -> CharNgramNB:
    """Train the embedded model (deterministic: fixed corpus, no RNG)."""
    texts, labels = [], []
    for lang, sents in DEMO_SENTENCES.items():
        for s in sents:
            texts.append(s)
            labels.append(lang)
    return CharNgramNB().fit(texts, labels)


_DEFAULT: CharNgramNB | None = None


def default_model() -> CharNgramNB:
    """The committed 24-language model, trained once per process — the
    default scorer behind ``lang_id(..., model="default")`` (the codegen
    marker heuristic stays the model=None tier: it is the SQL-restatable
    path the arithmetic oracles gate)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = train_demo_model()
    return _DEFAULT
