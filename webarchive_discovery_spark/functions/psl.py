"""Public Suffix List snapshot + the standard PSL matching algorithm.

The reference resolves ``public_suffix`` / ``domain`` with Guava's
``InternetDomainName.publicSuffix()`` (``LinkExtractor.java:110-194``),
which implements the publicsuffix.org algorithm over the full list —
including the PRIVATE section (so ``blogspot.com``-style hosted platforms
count as public suffixes, exactly what a links_domains rollup wants).

This module loads the COMPLETE upstream list from a system copy when one
exists (the ``publicsuffix`` OS package or the JDK ship it — see
``_PSL_SYSTEM_PATHS``; ~9,500 rules, full Guava parity) and otherwise
falls back to an embedded SNAPSHOT in the canonical PSL file format
(one rule per line, ``*.`` wildcard rules, ``!`` exception rules, ``//``
comments).  Either way it implements the published matching algorithm:

1. a rule matches when its labels are a suffix of the host's labels
   (``*`` matches exactly one label);
2. a matching EXCEPTION rule wins outright — the public suffix is the rule
   minus its leftmost label;
3. otherwise the matching rule with the most labels wins;
4. no match ⇒ the default rule ``*`` applies (last label is the suffix).

The snapshot covers the high-traffic portion of the ICANN section (all
registry families a web-archive crawl of the general web hits with any
frequency: ccTLD second-level registries, US state/K-12, JP prefecture +
city wildcards/exceptions, AU state registries, the wildcard ccTLDs) plus
the most common PRIVATE-section hosting platforms.  It is pure public data
(publicsuffix.org); to extend to the complete list, paste the upstream file
into ``_PSL_SNAPSHOT`` — the format is identical and nothing else changes.

Single-label rules are intentionally omitted: the default rule already
yields the bare TLD, so only multi-label rules alter behavior.
"""

from __future__ import annotations

__all__ = ["public_suffix_of", "rule_counts"]

_US_STATES = (
    "al ak az ar ca co ct dc de fl ga hi id il in ia ks ky la me md ma mi mn "
    "ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut vt va wa "
    "wv wi wy"
).split()

_JP_PREFECTURES = (
    "hokkaido aomori iwate miyagi akita yamagata fukushima ibaraki tochigi "
    "gunma saitama chiba tokyo kanagawa niigata toyama ishikawa fukui "
    "yamanashi nagano gifu shizuoka aichi mie shiga kyoto osaka hyogo nara "
    "wakayama tottori shimane okayama hiroshima yamaguchi tokushima kagawa "
    "ehime kochi fukuoka saga nagasaki kumamoto oita miyazaki kagoshima "
    "okinawa"
).split()

_JP_CITY_WILDCARDS = "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama".split()

_AU_STATES = "act nsw nt qld sa tas vic wa".split()

_PSL_SNAPSHOT = """
// ===== ICANN SECTION (snapshot) =====
// United Kingdom (also special-cased reference-side, LinkExtractor.java:129-136)
co.uk
org.uk
ac.uk
gov.uk
sch.uk
nhs.uk
net.uk
me.uk
ltd.uk
plc.uk
mod.uk
police.uk
// Australia (state registries generated below)
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// New Zealand
co.nz
org.nz
net.nz
govt.nz
ac.nz
school.nz
gen.nz
geek.nz
maori.nz
iwi.nz
// Japan (prefectures + city wildcards generated below)
co.jp
or.jp
ne.jp
ac.jp
go.jp
ad.jp
ed.jp
gr.jp
lg.jp
// China
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mil.cn
// Brazil
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
blog.br
eco.br
// India
co.in
net.in
org.in
gov.in
ac.in
edu.in
res.in
gen.in
firm.in
ind.in
nic.in
mil.in
// South Africa
co.za
org.za
net.za
gov.za
ac.za
edu.za
web.za
// Mexico
com.mx
org.mx
gob.mx
edu.mx
net.mx
// South Korea
co.kr
or.kr
go.kr
ac.kr
ne.kr
re.kr
pe.kr
mil.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
// Taiwan
com.tw
org.tw
gov.tw
edu.tw
net.tw
idv.tw
// Singapore
com.sg
org.sg
gov.sg
edu.sg
net.sg
per.sg
// Israel
co.il
org.il
gov.il
ac.il
net.il
muni.il
k12.il
idf.il
// Argentina
com.ar
org.ar
gob.ar
edu.ar
net.ar
int.ar
mil.ar
// Turkey
com.tr
org.tr
gov.tr
net.tr
edu.tr
k12.tr
bel.tr
av.tr
pol.tr
mil.tr
web.tr
gen.tr
tv.tr
bbs.tr
name.tr
tel.tr
dr.tr
// Indonesia
co.id
or.id
go.id
ac.id
sch.id
net.id
web.id
my.id
biz.id
desa.id
// Hong Kong
com.hk
org.hk
gov.hk
edu.hk
net.hk
idv.hk
// Macau
com.mo
org.mo
gov.mo
edu.mo
net.mo
// Malaysia
com.my
org.my
gov.my
edu.my
net.my
mil.my
name.my
// Ukraine
com.ua
org.ua
gov.ua
net.ua
edu.ua
in.ua
// Poland
com.pl
org.pl
gov.pl
edu.pl
net.pl
art.pl
info.pl
waw.pl
wroc.pl
krakow.pl
poznan.pl
lodz.pl
gda.pl
slupsk.pl
// Thailand
co.th
or.th
ac.th
go.th
in.th
mi.th
net.th
// Vietnam
com.vn
org.vn
edu.vn
gov.vn
net.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// Philippines
com.ph
org.ph
gov.ph
edu.ph
net.ph
ngo.ph
mil.ph
// Pakistan
com.pk
org.pk
gov.pk
edu.pk
net.pk
fam.pk
biz.pk
web.pk
gob.pk
gok.pk
gon.pk
gop.pk
gos.pk
// Bangladesh (wildcard TLD)
*.bd
// Sri Lanka
com.lk
org.lk
gov.lk
edu.lk
net.lk
int.lk
ac.lk
sch.lk
ngo.lk
soc.lk
web.lk
ltd.lk
assn.lk
grp.lk
hotel.lk
// Nepal (wildcard TLD)
*.np
// Kazakhstan
com.kz
org.kz
gov.kz
edu.kz
net.kz
mil.kz
// Iran
co.ir
org.ir
gov.ir
ac.ir
net.ir
sch.ir
id.ir
// Saudi Arabia
com.sa
org.sa
gov.sa
edu.sa
net.sa
med.sa
pub.sa
sch.sa
// United Arab Emirates
co.ae
org.ae
gov.ae
ac.ae
net.ae
sch.ae
mil.ae
// Qatar
com.qa
org.qa
gov.qa
edu.qa
net.qa
mil.qa
sch.qa
// Kuwait
com.kw
org.kw
gov.kw
edu.kw
net.kw
// Oman
com.om
org.om
gov.om
edu.om
net.om
med.om
museum.om
co.om
pro.om
// Jordan
com.jo
org.jo
gov.jo
edu.jo
net.jo
mil.jo
name.jo
sch.jo
// Lebanon
com.lb
org.lb
gov.lb
edu.lb
net.lb
// Egypt
com.eg
org.eg
gov.eg
edu.eg
net.eg
sci.eg
eun.eg
mil.eg
name.eg
// Libya
com.ly
org.ly
gov.ly
edu.ly
net.ly
sch.ly
med.ly
plc.ly
id.ly
// Algeria
com.dz
org.dz
gov.dz
edu.dz
net.dz
asso.dz
pol.dz
art.dz
// Morocco
co.ma
net.ma
org.ma
press.ma
ac.ma
gov.ma
// Nigeria
com.ng
org.ng
gov.ng
edu.ng
net.ng
name.ng
sch.ng
mobi.ng
mil.ng
i.ng
// Kenya
co.ke
or.ke
go.ke
ac.ke
ne.ke
sc.ke
info.ke
me.ke
mobi.ke
// Tanzania
co.tz
go.tz
or.tz
ac.tz
ne.tz
sc.tz
hotel.tz
info.tz
me.tz
mil.tz
mobi.tz
tv.tz
// Uganda
co.ug
or.ug
go.ug
ac.ug
ne.ug
sc.ug
org.ug
com.ug
// Zambia
co.zm
org.zm
gov.zm
ac.zm
edu.zm
sch.zm
net.zm
mil.zm
biz.zm
info.zm
// Zimbabwe
co.zw
org.zw
gov.zw
ac.zw
mil.zw
school.zw
// Botswana
co.bw
org.bw
// Ghana
com.gh
org.gh
gov.gh
edu.gh
mil.gh
// Mozambique
co.mz
org.mz
gov.mz
edu.mz
ac.mz
adv.mz
net.mz
// Malawi
ac.mw
co.mw
com.mw
gov.mw
org.mw
edu.mw
int.mw
museum.mw
net.mw
biz.mw
coop.mw
// Namibia
com.na
org.na
co.na
// Eritrea (wildcard TLD)
*.er
// Falklands (wildcard TLD)
*.fk
// Jamaica (wildcard TLD)
*.jm
// Cambodia (wildcard TLD)
*.kh
// Papua New Guinea (wildcard TLD)
*.pg
// Cook Islands (wildcard + exception)
*.ck
!www.ck
// Myanmar
com.mm
org.mm
net.mm
edu.mm
gov.mm
// Chile
gob.cl
gov.cl
mil.cl
// Colombia
com.co
org.co
edu.co
gov.co
net.co
nom.co
mil.co
info.co
web.co
arts.co
firm.co
int.co
rec.co
// Peru
com.pe
org.pe
edu.pe
gob.pe
net.pe
mil.pe
nom.pe
sld.pe
// Venezuela
com.ve
org.ve
gob.ve
edu.ve
net.ve
mil.ve
web.ve
co.ve
info.ve
// Ecuador
com.ec
org.ec
gob.ec
edu.ec
net.ec
info.ec
fin.ec
k12.ec
med.ec
mil.ec
pro.ec
gov.ec
// Uruguay
com.uy
org.uy
edu.uy
gub.uy
net.uy
mil.uy
// Paraguay
com.py
org.py
edu.py
gov.py
net.py
mil.py
coop.py
una.py
// Bolivia
com.bo
org.bo
gob.bo
edu.bo
net.bo
mil.bo
int.bo
tv.bo
web.bo
// Costa Rica
co.cr
or.cr
go.cr
ac.cr
fi.cr
ed.cr
sa.cr
// Guatemala
com.gt
org.gt
gob.gt
edu.gt
net.gt
ind.gt
mil.gt
// Dominican Republic
com.do
org.do
gob.do
edu.do
net.do
gov.do
mil.do
sld.do
art.do
web.do
// Honduras
com.hn
org.hn
gob.hn
edu.hn
net.hn
mil.hn
// Nicaragua
com.ni
org.ni
gob.ni
edu.ni
net.ni
ac.ni
biz.ni
info.ni
int.ni
mil.ni
// El Salvador
com.sv
org.sv
gob.sv
edu.sv
red.sv
// Panama
com.pa
org.pa
gob.pa
edu.pa
ac.pa
net.pa
sld.pa
abo.pa
ing.pa
med.pa
nom.pa
// Cuba
com.cu
org.cu
edu.cu
gov.cu
inf.cu
net.cu
// Trinidad and Tobago
com.tt
org.tt
gov.tt
edu.tt
co.tt
net.tt
biz.tt
info.tt
pro.tt
name.tt
// Barbados
com.bb
org.bb
gov.bb
edu.bb
net.bb
co.bb
biz.bb
info.bb
store.bb
tv.bb
// Bahamas
com.bs
org.bs
edu.bs
gov.bs
net.bs
// Canada (provinces)
on.ca
qc.ca
bc.ca
ab.ca
mb.ca
ns.ca
nb.ca
sk.ca
nl.ca
pe.ca
nt.ca
nu.ca
yt.ca
gc.ca
// France
gouv.fr
asso.fr
com.fr
nom.fr
prd.fr
tm.fr
avocat.fr
aeroport.fr
// Italy
gov.it
edu.it
// Portugal
com.pt
org.pt
edu.pt
gov.pt
net.pt
int.pt
publ.pt
nome.pt
// Spain
com.es
org.es
gob.es
edu.es
nom.es
// Austria
co.at
or.at
ac.at
gv.at
priv.at
// Belgium
ac.be
// Ireland
gov.ie
// Hungary
co.hu
org.hu
info.hu
priv.hu
tm.hu
2000.hu
agrar.hu
bolt.hu
city.hu
film.hu
forum.hu
games.hu
hotel.hu
ingatlan.hu
jogasz.hu
konyvelo.hu
lakas.hu
media.hu
news.hu
reklam.hu
sex.hu
shop.hu
sport.hu
suli.hu
szex.hu
tozsde.hu
utazas.hu
video.hu
// Romania
com.ro
org.ro
tm.ro
nt.ro
nom.ro
info.ro
rec.ro
arts.ro
firm.ro
store.ro
www.ro
// Greece
edu.gr
gov.gr
net.gr
org.gr
com.gr
// Serbia
co.rs
org.rs
edu.rs
in.rs
ac.rs
gov.rs
// Latvia
com.lv
org.lv
edu.lv
gov.lv
mil.lv
net.lv
asn.lv
conf.lv
id.lv
// Estonia
com.ee
org.ee
edu.ee
gov.ee
riik.ee
lib.ee
med.ee
pri.ee
aip.ee
fie.ee
// Belarus
com.by
gov.by
mil.by
of.by
// Georgia
com.ge
org.ge
gov.ge
edu.ge
net.ge
mil.ge
pvt.ge
// Azerbaijan
com.az
org.az
gov.az
edu.az
net.az
mil.az
int.az
biz.az
info.az
name.az
pro.az
// Armenia
com.am
net.am
org.am
// Mongolia
gov.mn
edu.mn
org.mn
nyc.mn
// Maldives
com.mv
org.mv
gov.mv
edu.mv
net.mv
aero.mv
biz.mv
coop.mv
info.mv
int.mv
mil.mv
museum.mv
name.mv
pro.mv
// Afghanistan
com.af
org.af
gov.af
edu.af
net.af
// Bhutan
com.bt
edu.bt
gov.bt
net.bt
org.bt
// Kyrgyzstan
org.kg
net.kg
com.kg
edu.kg
gov.kg
mil.kg
// Uzbekistan
com.uz
co.uz
net.uz
org.uz
// Tajikistan
com.tj
org.tj
gov.tj
edu.tj
ac.tj
co.tj
go.tj
biz.tj
int.tj
mil.tj
name.tj
net.tj
nic.tj
test.tj
web.tj
// Turkmenistan
com.tm
co.tm
org.tm
net.tm
nom.tm
gov.tm
mil.tm
edu.tm
// Laos
com.la
org.la
edu.la
gov.la
int.la
net.la
info.la
per.la
// ===== PRIVATE SECTION (snapshot: common hosted platforms) =====
// (Guava's publicSuffix() includes these — hosted-subdomain sites roll up
// as their own "domains", which is what links_domains wants)
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.com.br
blogspot.in
blogspot.de
blogspot.fr
blogspot.jp
blogspot.mx
blogspot.ca
blogspot.it
blogspot.es
blogspot.nl
blogspot.se
appspot.com
herokuapp.com
azurewebsites.net
cloudfront.net
netlify.app
vercel.app
pages.dev
workers.dev
web.app
firebaseapp.com
wordpress.com
wixsite.com
weebly.com
tumblr.com
neocities.org
readthedocs.io
surge.sh
glitch.me
repl.co
fly.dev
onrender.com
ngrok.io
duckdns.org
dyndns.org
s3.amazonaws.com
*.elb.amazonaws.com
"""


#: Where a COMPLETE upstream list may live: the ``publicsuffix`` OS package
#: and the JDK both ship publicsuffix.org's full file.  When one is present
#: it replaces the embedded snapshot (same format, same parser), giving the
#: full ~9,500-rule coverage Guava has; the snapshot keeps the module
#: standalone when neither exists.
_PSL_SYSTEM_PATHS = (
    "/usr/share/publicsuffix/public_suffix_list.dat",
    "/usr/share/publicsuffix/effective_tld_names.dat",
    "/etc/java-17-openjdk/security/public_suffix_list.dat",
)


def _load_full_list() -> list[str] | None:
    import os

    for p in _PSL_SYSTEM_PATHS:
        if os.path.isfile(p):
            try:
                with open(p, encoding="utf-8") as f:
                    text = f.read()
            except OSError:
                continue
            # sanity: must look like the canonical file (both sections)
            if "===BEGIN ICANN DOMAINS===" in text:
                return text.splitlines()
    return None


def _build(lines: list[str] | None = None):
    exact: set[str] = set()
    wildcards: set[str] = set()  # stored WITHOUT the "*." prefix
    exceptions: set[str] = set()  # stored WITHOUT the "!" prefix
    if lines is None:
        lines = _PSL_SNAPSHOT.splitlines()
        for st in _US_STATES:  # US locality registries (PSL us section)
            lines += [f"{st}.us", f"k12.{st}.us", f"cc.{st}.us", f"lib.{st}.us"]
        for p in _JP_PREFECTURES:  # JP prefecture registries
            lines.append(f"{p}.jp")
        for c in _JP_CITY_WILDCARDS:  # JP city wildcards + city.X exceptions
            lines += [f"*.{c}.jp", f"!city.{c}.jp"]
        for st in _AU_STATES:  # AU state education/government registries
            lines += [f"{st}.edu.au", f"{st}.gov.au"]
    for raw in lines:
        rule = raw.strip()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            exceptions.add(rule[1:])
        elif rule.startswith("*."):
            wildcards.add(rule[2:])
        else:
            exact.add(rule)
    return exact, wildcards, exceptions


_FULL_LIST = _load_full_list()
_EXACT, _WILDCARDS, _EXCEPTIONS = _build(_FULL_LIST)
USING_FULL_LIST = _FULL_LIST is not None


def public_suffix_of(host: str) -> str:
    """Public suffix of an already-lowercased dotted host, per the PSL
    algorithm (longest match; exceptions win; default rule = last label).
    The host itself may be the suffix (``com.br → com.br``), matching
    Guava's ``InternetDomainName.publicSuffix`` on a bare suffix."""
    labels = host.split(".")
    n = len(labels)
    for i in range(n - 1):  # longest candidate first
        cand = ".".join(labels[i:])
        if cand in _EXCEPTIONS:
            return ".".join(labels[i + 1:])
        if cand in _EXACT:
            return cand
        if ".".join(labels[i + 1:]) in _WILDCARDS:
            return cand
    return labels[-1]


def rule_counts() -> dict[str, int]:
    """Snapshot size, for tests/docs."""
    return {
        "exact": len(_EXACT),
        "wildcard": len(_WILDCARDS),
        "exception": len(_EXCEPTIONS),
    }
